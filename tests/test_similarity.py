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
    # these embeddings are near-isotropic (top-5 cosine ~0.3-0.5), so the
    # bucket-collision probability per table must be kept generous:
    # 4 bits -> p = P(bit agree)^4 with p_bit ~ 0.6, x16 tables
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_hyperplane_topk(emb, queries, k=5, bits=4, n_tables=16).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall


def test_cosine_topk_excludes_self_and_ranks(spark):
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    res = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=3).collect()
    assert [r["rank"] for r in res] == [1, 2, 3]
    assert all(r["neighbor_id"] != 0 for r in res)
    sims = [r["cosine"] for r in res]
    assert sims == sorted(sims, reverse=True)
