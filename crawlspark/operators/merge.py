"""MERGE-on-read resolution: latest version wins per key.

The engine's frontier is maintained exactly this way (base parts +
append deltas resolved at read time — engine.py ``pending``); this
module exposes the resolution step as a standalone operator for
warehouse-style SCD/upsert pipelines: union the base with the update
stream, then keep each key's highest-version row. One shuffle on the
key; no base rewrite ever happens (the write side stays O(delta))."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_wins(
    df: DataFrame, key_cols: list[str], version_col: str, tiebreak: str | None = None
) -> DataFrame:
    """Resolve a unioned base+updates frame to one row per key: the row
    with the greatest ``version_col`` (ties broken by ``tiebreak``
    descending when given — pass one whenever versions can collide, or
    the surviving row is partition-order-dependent)."""
    order = [F.desc(version_col)] + ([F.desc(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """MERGE INTO semantics, read-side: updates win over base rows with
    the same key when their version is higher; unmatched update keys
    insert. Both inputs must share a schema."""
    return latest_wins(
        base.unionByName(updates), key_cols, version_col, tiebreak
    )
