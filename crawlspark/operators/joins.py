"""Temporal join operators Spark lacks as built-ins: as-of join and
range (interval) join, both expressed as shuffle-efficient compositions
of DataFrame primitives.

- as-of join: the reference's per-domain ``last_request_time`` lookup
  (crawler/frontier.py:97-106) is a point-in-time state join — "the most
  recent prior observation for this key". SURVEY.md §2's join table maps
  it to an as-of/state join; this module provides the general operator.
  Implementation is the single-shuffle union trick: tag both sides,
  sort (key, ts, side) within key partitions, and carry the right side's
  latest row forward with ``last(ignorenulls)`` — O((|L|+|R|) log) in
  one exchange, instead of the naive inequality join Spark would
  execute as a broadcast-nested-loop (quadratic per key).

- range join: pairs within a time window. A plain ``ON a.key = b.key
  AND b.ts BETWEEN a.ts AND a.ts + W`` join shuffles on key alone and
  re-scans every row pair per key (and with no equi-key at all Spark
  falls back to BNLJ). Bucketing time into width-W epochs turns it into
  an equi-join on (key, bucket) — each left row probes exactly two
  buckets — followed by the exact interval filter. At 100 TB this is the
  difference between a hash join and a cartesian blow-up per hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    allow_exact: bool = True,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row with
    the greatest ``right_ts`` <= ``left_ts`` (< when ``allow_exact`` is
    False) for the same ``on`` key. Right ``value_cols`` come back
    null-filled when no prior right row exists (LEFT semantics, matching
    DuckDB's ``ASOF LEFT JOIN``).

    The right side's value columns are packed into ONE struct before the
    union so ``last(ignorenulls)`` carries them forward atomically — all
    matched values come from the same right row even when individual
    fields are null.

    Determinism: ties among right rows at the same (key, ts) are broken
    by the LAST one in (ts, value-struct) order; pre-aggregate the right
    side to unique (key, ts) when the tie choice matters (the query-layer
    twin does exactly that, mirroring the oracle's arg_max).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]
    packed = F.struct(*[F.col(c) for c in value_cols])
    # side tag orders right rows before (inclusive) or after (exclusive)
    # left rows at equal timestamps
    r_side, l_side = (0, 1) if allow_exact else (1, 0)
    r2 = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(r_side).alias("_side"),
        packed.alias("_r"),
    )
    l2 = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast(r2.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    both = r2.withColumn("_l", F.lit(None).cast(l2.schema["_l"].dataType)).unionByName(l2)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = both.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    out = matched.filter(F.col("_l").isNotNull()).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(c) for c in value_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_sec: float = 3600.0,
    condition: Column | None = None,
) -> DataFrame:
    """Equi-bucketed interval join: all (left, right) pairs with the same
    ``on`` key and ``left_ts <= right_ts <= left_ts + window_sec``,
    optionally restricted further by ``condition`` (evaluated on the
    joined frame; left columns keep their names, right columns get an
    ``r_`` prefix).

    Both sides get a time bucket of width ``window_sec``; a qualifying
    right row's bucket is either the left row's or the next one, so the
    left side is exploded into exactly two (key, bucket) probe rows and
    the join is a plain hash equi-join on (key, bucket) — never an
    inequality-only join. The exact BETWEEN filter then prunes the
    false candidates the coarse buckets admit.
    """
    # all time arithmetic in integer microseconds (exact; also covers
    # TIMESTAMP_NTZ inputs, which won't cast to double — the session runs
    # UTC so the NTZ->TIMESTAMP cast is value-identity)
    w_us = int(window_sec * 1_000_000)

    def _us(c: str) -> Column:
        return F.unix_micros(F.col(c).cast("timestamp"))

    lb = F.floor(_us(left_ts) / F.lit(w_us))
    rb = F.floor(_us(right_ts) / F.lit(w_us))
    l2 = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.col(on).alias("_k"),
        _us(left_ts).alias("_lts"),
        F.explode(F.array(lb, lb + 1)).alias("_b"),
    )
    r2 = right.select(
        F.struct(*[F.col(c) for c in right.columns]).alias("_r"),
        F.col(on).alias("_k"),
        _us(right_ts).alias("_rts"),
        rb.alias("_b"),
    )
    joined = l2.join(r2, ["_k", "_b"]).filter(
        (F.col("_rts") >= F.col("_lts"))
        & (F.col("_rts") <= F.col("_lts") + F.lit(w_us))
    )
    out = joined.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_r.{c}").alias(f"r_{c}") for c in right.columns],
    )
    if condition is not None:
        out = out.filter(condition)
    return out
