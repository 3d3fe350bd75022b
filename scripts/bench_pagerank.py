#!/usr/bin/env python
"""Two-level scaling probe for the PageRank operator on a graph big
enough for compute to dominate task scheduling (the sf0.1 documents
graph is ~15k edges — at that size local[32] pays hundreds of
near-empty tasks per iteration and measures overhead, not the
operator; scaling_pipeline_r4c.json shows exactly that).

Synthesizes a skewed directed graph IN Spark (spark.range + exprs,
~1% of nodes receive 30% of edges — hub skew like a web graph), runs
damped PageRank for 5 iterations at local[8] then local[32], and
reports edge-iterations/sec at both plus the 8->32 speedup.

Usage: python scripts/bench_pagerank.py [n_edges] [n_nodes] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawlspark.operators.linkgraph import pagerank
from crawlspark.session import get_spark

N_ITER = 5


def build_edges(spark, n_edges: int, n_nodes: int):
    e = spark.range(n_edges)
    src = (F.col("id") * 48271) % n_nodes
    flat = (F.col("id") * 69621 + 13) % n_nodes
    hub = flat % (n_nodes // 100 or 1)  # hub skew: compress into 1% of ids
    dst = F.when(F.col("id") % 10 < 3, hub).otherwise(flat)
    return e.select(src.alias("src"), dst.alias("dst"))


def run_at(cores: int, n_edges: int, n_nodes: int, runs: int = 3) -> dict:
    """First sample is COLD (includes the one-time edge repartition +
    cache build — the O(edges) shuffle that dominates at scale); later
    samples find the previous run's InMemoryRelation by canonicalized
    plan and measure the per-iteration work alone (the O(nodes)
    rank-vector path). Both are reported: cold is the scale-bound
    number, warm isolates the iteration chain."""
    spark = get_spark(
        f"prscale-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    samples = []
    for _ in range(runs):
        edges = build_edges(spark, n_edges, n_nodes)
        t0 = time.time()
        out = pagerank(edges, n_iter=N_ITER)
        n_rows = out.count()
        samples.append(round(time.time() - t0, 2))
    spark.stop()
    cold, warm = samples[0], min(samples[1:])
    return {
        "samples": samples,
        "cold": cold,
        "warm_best": warm,
        "nodes": n_rows,
        "cold_edge_iters_per_sec": round(n_edges * N_ITER / cold),
        "warm_edge_iters_per_sec": round(n_edges * N_ITER / warm),
    }


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    r8 = run_at(8, n_edges, n_nodes)
    time.sleep(20)  # host settle between sessions
    r32 = run_at(32, n_edges, n_nodes)
    out = {
        "n_edges": n_edges,
        "n_nodes": n_nodes,
        "n_iter": N_ITER,
        "local8": r8,
        "local32": r32,
        "speedup_8_to_32_cold": round(r8["cold"] / r32["cold"], 2),
        "speedup_8_to_32_warm": round(r8["warm_best"] / r32["warm_best"], 2),
    }
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
