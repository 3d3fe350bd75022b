#!/usr/bin/env python
"""Two-level scaling evidence for the pipeline operators (VERDICT r3 #9).

scaling_bench.py covers the crawl loop; this runs the dedup/ANN driver
queries at local[8] vs local[32] over the same scale-factor dir (default
sf0.1 — 10x the sf0.01 correctness-gate corpus), each level in its own
Spark session, 2 timed runs per query (first run includes Python-worker
warmup; the min is the comparable number). Reports per-query 8→32
speedup — the no-regression bar is speedup >= 0.75 (never >25% slower
with 4x cores).

Usage: python scripts/scaling_pipeline_ops.py [sf_dir] [out.json] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from crawlspark.session import get_spark

QUERIES = [
    "minhash_lsh",
    "dedup_clusters",
    "embedding_neardup_lsh",
    "ann_ivf_topk",
    "asof_join",
    "range_join",
    "tfidf_topk",
    "pagerank",
    "image_gate",
    "recrawl_schedule",
    "passage_dedup",
    "sample_weighted",
    "cms_heavy_hitters",
    "xmodal_neardup",
    "merge_on_read_delete",
    "dedup_keep_best",
    "bpe_train",
    "shard_stats",
    "dust_rules",
    "lm_perplexity",
    "pii_scrub",
    "mix_sources",
]


def run_at(cores: int, sf_dir: str, runs: int = 3) -> dict:
    spark = get_spark(
        f"pipescale-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    qs = E.queries()
    out: dict = {}
    for name in QUERIES:
        samples = []
        for _ in range(runs):
            t0 = time.monotonic()
            n = len(qs[name](spark, sf_dir).collect())
            samples.append(round(time.monotonic() - t0, 2))
        out[name] = {"samples": samples, "best": min(samples), "rows": n}
    spark.stop()
    return out


def main() -> None:
    global QUERIES
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # optional out_json (must end in .json), then an explicit query
    # subset for targeted passes
    rest = sys.argv[2:]
    out_path = None
    if rest and rest[0].endswith(".json"):
        out_path = rest[0]
        rest = rest[1:]
    if rest:
        QUERIES = rest
    r8 = run_at(8, sf_dir)
    time.sleep(20)  # host settle: back-to-back sessions pollute samples
    r32 = run_at(32, sf_dir)
    out = {"sf_dir": sf_dir, "local8": r8, "local32": r32, "speedup_8_to_32": {}}
    for name in QUERIES:
        out["speedup_8_to_32"][name] = round(r8[name]["best"] / r32[name]["best"], 2)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
