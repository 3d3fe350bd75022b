"""ANN (hyperplane LSH) recall vs the exact brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlspark.operators.similarity import ann_hyperplane_topk, cosine_topk


def test_ann_recall_against_bruteforce(spark):
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 15)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_hyperplane_topk(emb, queries, k=5, bits=8, n_tables=12).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall  # 12 tables x 8 bits on 500 x 64-dim vecs


def test_cosine_topk_excludes_self_and_ranks(spark):
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    res = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=3).collect()
    assert [r["rank"] for r in res] == [1, 2, 3]
    assert all(r["neighbor_id"] != 0 for r in res)
    sims = [r["cosine"] for r in res]
    assert sims == sorted(sims, reverse=True)
