#!/usr/bin/env python
"""sf1 scaling proof (VERDICT r4 #9): run the dedup / ANN / semdedup /
substring suite end-to-end at sf0.1 AND sf1 (10x rows, scripts/
make_sf1.py) and report per-query wall times + the sf1/sf0.1 ratio.
Expectation: every query scales at or under its documented complexity —
roughly linear (ratio ≲ 10, usually well under since fixed job latency
amortizes) except the declared exactness baselines.

semdedup is benched through the operator with the paper's cells ∝ N
knob (64 cells at sf0.1 → 640 at sf1) — constant expected cell size, so
the within-cell quadratic stays linear in total; the fixed-cells twin
query would be the documented O(N²/cells) shape instead.

Usage: python scripts/bench_sf1.py [sf1_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawlspark.session import get_spark

SUITE = [
    "doc_fingerprint",
    "ngram_jaccard",
    "ngram_jaccard_capped",
    "passage_dedup",
    "substring_dedup",
    "minhash_lsh",
    "dedup_clusters",
    "dedup_keep_best",
    "cluster_split",
    "simhash_pairs",
    "tfidf_topk",
    "chunk_documents",
    "dsir_weights",
    "embedding_topk",
    "embedding_neardup",
    "embedding_neardup_lsh",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_ivf_trained",
]

# documented complexity notes surfaced in the output next to each ratio
NOTES = {
    "embedding_topk": "exact O(N*Q) baseline by contract",
    "ann_ivf_trained": "includes in-query Lloyd training passes",
}


def _sem_dedup(spark, sf_dir, n_cells):
    import pyspark.sql.functions as F

    from crawlspark.operators import dedup as DD
    from crawlspark.operators.similarity import ivf_anchors

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return DD.semdedup(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")),
        anchors=ivf_anchors(64, n_cells), n_cells=n_cells, eps=0.96,
        method="gemm", dim=64,
    )


def run_suite(spark, sf_dir: str, n_cells: int) -> dict:
    import __spark_entry__ as E

    qs = E.queries()

    def timed(fn):
        # two samples, keep the best (bench.py's honesty convention):
        # single-shot times in a long shared session swing several x on
        # JVM/GC state and host weather — the min is the code's cost
        samples = []
        for _ in range(2):
            t0 = time.monotonic()
            n = fn().count()
            samples.append(round(time.monotonic() - t0, 2))
        return {"sec": min(samples), "rows": n, "samples": samples}

    out = {}
    for name in SUITE:
        out[name] = timed(lambda name=name: qs[name](spark, sf_dir))
    out["semdedup_cells_propN"] = {
        **timed(lambda: _sem_dedup(spark, sf_dir, n_cells)),
        "n_cells": n_cells,
    }
    return out


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("sf1-bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    res = {
        "loadavg_at_launch": list(os.getloadavg()),
        "sf0.1": run_suite(spark, "/root/testdata/sf0.1", n_cells=64),
        "sf1": run_suite(spark, sf1_dir, n_cells=640),
    }
    ratios = {}
    for name, v in res["sf1"].items():
        base = res["sf0.1"][name]["sec"]
        r = {"ratio": round(v["sec"] / max(base, 1e-9), 2)}
        if name in NOTES:
            r["note"] = NOTES[name]
        ratios[name] = r
    res["sf1_over_sf0.1"] = ratios
    dest = sys.argv[2] if len(sys.argv) > 2 else None
    if dest:
        with open(dest, "w") as f:
            json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
