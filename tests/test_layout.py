"""Z-order layout (operators/layout.py): Morton key correctness and the
property the layout exists for — footer-stats pruning works on EVERY
clustered column, not just the leading sort key."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from crawlspark.operators.layout import zorder_key, zorder_layout


def _morton2(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=3).alias("z")
    ).collect()
    for r in out:
        assert r["z"] == _morton2(r["x"], r["y"], 3), (r["x"], r["y"])


def test_zorder_key_rejects_wide_keys(spark):
    with pytest.raises(ValueError):
        zorder_key([F.col("a")] * 4, bits=16)  # 64 bits > 63


def _file_prune_fraction(path: str, col: str, lo: float, hi: float) -> float:
    """Fraction of parquet files whose [min, max] for col intersects
    [lo, hi] — what a stats-aware scan would actually read."""
    import os

    import pyarrow.parquet as pq

    files = [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    ]
    hit = 0
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        ci = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        fmin = min(md.row_group(g).column(ci).statistics.min for g in range(md.num_row_groups))
        fmax = max(md.row_group(g).column(ci).statistics.max for g in range(md.num_row_groups))
        if not (hi < fmin or lo > fmax):
            hit += 1
    return hit / len(files)


def test_zorder_prunes_both_dimensions(spark):
    # two independent uniform dimensions; a 5%-wide slab on either one
    n = 20_000
    df = spark.range(n).select(
        ((F.col("id") * 48271) % 65537).alias("x"),
        ((F.col("id") * 69621) % 65539).alias("y"),
    )
    tmp = tempfile.mkdtemp(prefix="crawlspark_zorder_test_")
    try:
        zdir, ldir = f"{tmp}/zorder", f"{tmp}/linear"
        zorder_layout(df, ["x", "y"], n_files=16, bits=8).write.parquet(zdir)
        df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(ldir)

        x_slab = (0, 65537 * 0.05)
        y_slab = (0, 65539 * 0.05)
        # linear layout: x-slab prunes almost everything...
        assert _file_prune_fraction(ldir, "x", *x_slab) <= 0.2
        # ...but the y predicate reads every file
        assert _file_prune_fraction(ldir, "y", *y_slab) >= 0.9
        # z-order: BOTH single-column slabs skip most files
        assert _file_prune_fraction(zdir, "x", *x_slab) <= 0.5
        assert _file_prune_fraction(zdir, "y", *y_slab) <= 0.5
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_zorder_commit_records_cluster_bounds(spark, tmp_path):
    from crawlspark.icelite import IceliteCatalog

    df = spark.range(4096).select(
        ((F.col("id") * 7919) % 1024).alias("x"),
        ((F.col("id") * 104729) % 1024).alias("y"),
    )
    cat = IceliteCatalog(str(tmp_path / "cat"))
    snap = cat.commit(
        {"grid": zorder_layout(df, ["x", "y"], n_files=8, bits=6)},
        meta={},
        stats_cols={"grid": ["x", "y"]},
    )
    files = snap.tables["grid"]["files"]
    assert len(files) >= 4
    assert all("x" in f["bounds"] and "y" in f["bounds"] for f in files)
    # manifest-level pruning now works on the second dimension too
    kept = cat.prune_files(snap, "grid", "y", 0, 50)
    assert kept is not None and len(kept) < len(files)
