"""Deterministic global-shuffle sharding: assignment is the shared
md5-60 hash (stable under repartition), within-shard order is the hash
permutation, and write_shards materializes exactly that layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlspark.functions.text import md5_int60
from crawlspark.operators import sharding as SH

N = 200
SHARDS = 4


def _docs(spark):
    return spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
        (F.col("id") % 97 + 5).alias("n_chars"),
    )


def test_assign_deterministic_and_partition_invariant(spark):
    docs = _docs(spark)
    a = {
        r["doc_id"]: (r["shard"], r["shuffle_key"])
        for r in SH.assign_shards(docs, SHARDS).collect()
    }
    b = {
        r["doc_id"]: (r["shard"], r["shuffle_key"])
        for r in SH.assign_shards(docs.repartition(13), SHARDS).collect()
    }
    assert a == b
    assert {s for s, _ in a.values()} == set(range(SHARDS))
    for s, k in a.values():
        assert s == k % SHARDS


def test_stats_match_write_layout(spark, tmp_path):
    docs = _docs(spark)
    stats = {
        r["shard"]: (r["n_docs"], r["total_chars"], r["first_doc_id"])
        for r in SH.shard_stats(docs, SHARDS).collect()
    }
    assert sum(n for n, _, _ in stats.values()) == N

    out = str(tmp_path / "shards")
    SH.write_shards(docs, out, SHARDS)
    for s in range(SHARDS):
        part = (
            docs.sparkSession.read.parquet(f"{out}/shard={s}")
            .withColumn("h", md5_int60(F.col("doc_id").cast("string")))
            .collect()
        )
        assert len(part) == stats[s][0]
        # every row belongs to this shard and file order IS hash order
        keys = [(r["h"], r["doc_id"]) for r in part]
        assert all(h % SHARDS == s for h, _ in keys)
        assert keys == sorted(keys)
        assert part[0]["doc_id"] == stats[s][2]
