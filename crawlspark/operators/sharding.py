"""Deterministic global shuffle + balanced shard export.

The output side of a training-data pipeline: before training, the
corpus must be (a) globally shuffled — adjacent documents must not come
from the same crawl locality — and (b) written as N balanced shards that
data loaders can stream independently. Both are done here WITHOUT
randomness and WITHOUT a global sort:

- shard assignment = ``md5-60(id) mod n_shards`` — the repo's shared
  cross-engine hash, so the DuckDB oracle reproduces the exact split
  and the assignment is stable under retry/resume/repartition (same
  reason sampling.py rejects ``rand()``);
- the within-shard order is the HASH order ``(md5-60(id), id)`` — a
  deterministic permutation that is statistically indistinguishable
  from a uniform shuffle for training purposes, reproducible epoch to
  epoch, and needs only a per-shard sort (``sortWithinPartitions``),
  never a global one.

Scale story: one hash-partitioned exchange into exactly ``n_shards``
tasks + a per-partition sort that spills; no driver involvement, no
sampled range boundaries to skew. Balance is guaranteed in expectation
by the hash (shard sizes concentrate tightly for corpus >> n_shards);
``shard_stats`` is the cheap audit that reports the realized balance.

Reference parity: the reference crawler has no export stage (it stops
at report text files, reference crawler/__init__.py) — this is part of
the brief's training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlspark.functions.text import md5_int60


def assign_shards(
    df: DataFrame, n_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """Add (shard: int, shuffle_key: long) — deterministic shard and
    within-shard shuffle order for every row."""
    h = md5_int60(F.col(id_col).cast("string"))
    return df.withColumn("shuffle_key", h).withColumn(
        "shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards)).cast("int")
    )


def shard_stats(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
) -> DataFrame:
    """Per-shard audit of the deterministic split: row count, payload
    size, and the id that leads the shard's shuffle order (min_by —
    map-side partial, no window). Fully SQL-twinned."""
    a = assign_shards(df, n_shards, id_col)
    return a.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum(size_col).alias("total_chars"),
        F.min_by(id_col, F.struct("shuffle_key", id_col)).alias("first_doc_id"),
    )


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
) -> None:
    """Materialize the shuffled corpus as exactly ``n_shards`` parquet
    shard directories (shard=K/), each sorted in its deterministic
    shuffle order. ``repartition(n_shards, shard)`` routes every shard
    to one task; ``sortWithinPartitions`` is the only sort — local,
    spillable, never global."""
    (
        assign_shards(df, n_shards, id_col)
        .repartition(n_shards, F.col("shard"))
        # leading the sort with `shard` satisfies the partitioned
        # writer's required ordering, so FileFormatWriter does NOT
        # insert its own (order-destroying) sort over partition cols
        .sortWithinPartitions("shard", "shuffle_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
