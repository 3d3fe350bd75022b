"""Multi-dimensional data layout: z-order (Morton) clustering.

The heads scheduler (schedule.py / icelite bounds) prunes data files by
ONE key's footer min/max — enough for the frontier's
``registered_domain`` walk. But the corpus tables get filtered on more
than one axis at once (e.g. ``fetch_ts`` for incremental passes AND
``url_hash`` for membership probes; ``w``/``h`` for image admission).
A linear sort makes the second column's per-file ranges span the whole
domain, so its predicate prunes nothing. Z-ordering interleaves the
bits of rank-bucketed column values so files cover near-square regions
of the multi-column space — every clustered column's per-file min/max
stays narrow, and footer-stats pruning works on ALL of them (the same
trade Delta's OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite
make).

Everything is pure Catalyst bit arithmetic (shiftright / bitwise AND /
shiftleft / sum) — whole-stage-codegen friendly, no UDF — followed by
ONE range repartition on the z-value. At 100 TB this runs as the
compaction/OPTIMIZE job: one full shuffle, amortized over every
stats-pruned scan that follows. Bucket boundaries come from one tiny
min/max aggregate (2 scalars per column); at cluster scale that pass
reads parquet footers, not data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    bucket_cols: list[Column], bits: int = 10
) -> Column:
    """Interleave the low ``bits`` bits of already-bucketed int columns
    into a Morton key: bit b of column i lands at position
    ``b * n_cols + i``. With k columns the key uses ``bits * k`` bits
    (keep <= 63)."""
    k = len(bucket_cols)
    if not 1 <= k * bits <= 63:
        raise ValueError("bits * n_cols must be in [1, 63]")
    parts = []
    for i, c in enumerate(bucket_cols):
        c = c.cast("long")
        for b in range(bits):
            parts.append(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * k + i)
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def _bucket(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Uniform bucket id in [0, 2^bits) for a numeric column given its
    [lo, hi] range (degenerate range -> bucket 0). Uniform bucketing
    keeps the key computable from two scalars per column; for heavily
    skewed columns pass pre-bucketed rank columns to zorder_key
    directly (e.g. ntile or quantile-bucket upstream)."""
    n = 1 << bits
    if lo is None or hi is None or hi <= lo:  # empty input / constant col
        return F.lit(0)
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    return F.least(
        F.lit(n - 1), F.greatest(F.lit(0), F.floor(scaled * n).cast("long"))
    )


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = 10,
    z_col: str = "_z",
) -> DataFrame:
    """Rewrite ``df`` into a z-ordered layout over numeric ``cols``:
    range-repartition into ``n_files`` partitions by the Morton key and
    sort within each, so a plain ``.write.parquet`` emits one file per
    near-square region with tight footer bounds on every clustered
    column. The helper z column is dropped from the result.

    Pair with ``icelite.commit(..., stats_cols={table: cols})`` so the
    manifest records bounds for the clustered columns and
    ``prune_files`` can skip files on any of them."""
    ranges = df.agg(
        *[f for c in cols for f in (F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}"))]
    ).first()
    buckets = [
        _bucket(F.col(c), ranges[f"_lo_{c}"], ranges[f"_hi_{c}"], bits)
        for c in cols
    ]
    with_z = df.withColumn(z_col, zorder_key(buckets, bits))
    return (
        with_z.repartitionByRange(n_files, z_col)
        .sortWithinPartitions(z_col)
        .drop(z_col)
    )
