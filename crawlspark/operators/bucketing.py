"""Bucketed (pre-shuffled) table layout: co-located joins with no
runtime Exchange.

The 100 TB story: a fact-to-fact equi-join (lineitem ⋈ orders at 10^10
rows) shuffles BOTH sides on every query — at cluster scale that shuffle
is the job. Bucketing pays it ONCE at write time: ``bucketBy(n, key)``
hash-partitions rows into ``n`` buckets recorded in the catalog
(Hive/Iceberg bucket-transform contract), and every later equi-join or
aggregation on the bucket key reads already-co-located partitions —
Catalyst plans a SortMergeJoin with NO Exchange on either bucketed side
(asserted in tests/test_bucketing.py with broadcast disabled). With only
one side bucketed, only the other side shuffles.

This is the static sibling of the z-order rewrite (layout.py): z-order
optimizes multi-column RANGE pruning, bucketing optimizes repeated
equi-JOIN/agg keys. Production tables use both — bucket by the join key,
z-order within buckets on the scan predicates.

Local caveat baked into the design: bucket count is a layout-time choice.
Pick n_buckets so one bucket of the BIG table fits an executor
(rows/bucket ≈ total/n); joins between tables bucketed to different
counts shuffle the smaller-bucketed side only (Spark reads one side's
layout and re-shuffles the other).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> DataFrame:
    """Write ``df`` as a bucketed parquet table registered in the session
    catalog (external, at ``path``) and return the catalog-backed frame.

    ``sort=True`` additionally sorts rows by the bucket key inside each
    bucket file — the read side then feeds SortMergeJoin with cheap
    per-file merges instead of a full in-memory sort.
    """
    spark = df.sparkSession
    spark.sql(f"drop table if exists {name}")
    w = df.write.format("parquet").mode("overwrite").bucketBy(
        int(n_buckets), bucket_col
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.option("path", path).saveAsTable(name)
    return spark.table(name)
