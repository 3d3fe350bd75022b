"""icelite time-travel + changelog (incremental append / CDC) reads and
the cross-modal image+caption joint near-dup operator.

Time travel: ``IceliteCatalog.snapshot(id)`` reads a retained snapshot
without moving ``_current`` (Iceberg's VERSION AS OF).
Changelog: ``IceliteCatalog.changelog(from, to, name)`` returns exactly
the rows of the data files appended between two snapshots, planned from
manifest JSON alone; non-append (rewritten) histories raise, matching
Iceberg's incremental-scan restriction.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crawlspark.icelite import IceliteCatalog


def _write(df, path):
    df.write.parquet(path)
    return path


@pytest.fixture()
def cat(spark, tmp_path):
    """Three-commit catalog over one append-only by-reference table:
    snap0 = [d0], snap1 = [d0, d1], snap2 = [d0, d1, d2]."""
    root = str(tmp_path / "cat")
    c = IceliteCatalog(root)
    base = spark.range(0, 30).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    d0 = _write(base.filter("k < 10"), str(tmp_path / "d0"))
    d1 = _write(base.filter("k >= 10 and k < 20"), str(tmp_path / "d1"))
    d2 = _write(base.filter("k >= 20"), str(tmp_path / "d2"))
    c.commit({"t": [d0]}, {"round": 0})
    c.commit({"t": [d0, d1]}, {"round": 1})
    c.commit({"t": [d0, d1, d2]}, {"round": 2})
    return c


def test_time_travel_reads_old_snapshot(spark, cat):
    assert cat.latest().snapshot_id == 2
    for sid, n in ((0, 10), (1, 20), (2, 30)):
        snap = cat.snapshot(sid)
        assert snap.snapshot_id == sid
        got = cat.load(spark, snap, "t")
        assert got.count() == n
    # time travel does not move _current
    assert cat.latest().snapshot_id == 2


def test_changelog_returns_exactly_appended_rows(spark, cat):
    delta = cat.changelog(spark, cat.snapshot(0), cat.snapshot(1), "t")
    ks = sorted(r.k for r in delta.collect())
    assert ks == list(range(10, 20))
    # spanning two commits: union of both appended deltas
    delta02 = cat.changelog(spark, cat.snapshot(0), cat.snapshot(2), "t")
    assert sorted(r.k for r in delta02.collect()) == list(range(10, 30))


def test_changelog_empty_and_missing(spark, cat):
    # same snapshot on both ends -> nothing appended
    assert cat.changelog(spark, cat.snapshot(1), cat.snapshot(1), "t") is None
    # table absent from the target snapshot -> None
    assert cat.changelog(spark, cat.snapshot(0), cat.snapshot(1), "nope") is None


def test_changelog_rejects_rewritten_history(spark, cat, tmp_path):
    # a DataFrame commit REWRITES the table into the snapshot dir: the
    # old by-reference files are dropped -> incremental read must refuse
    df = spark.range(0, 5).select(F.col("id").alias("k"), F.lit(0).alias("v"))
    cat.commit({"t": df}, {"round": 3})
    with pytest.raises(ValueError, match="rewritten"):
        cat.changelog(spark, cat.snapshot(2), cat.snapshot(3), "t")


def test_snapshot_raises_after_expiry(spark, cat):
    cat.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        cat.snapshot(0)
    # the retained snapshot still loads
    assert cat.load(spark, cat.latest(), "t").count() == 30


def test_image_caption_neardup_joint_gate(spark):
    """Planted corpus: pair (a0,a1) matches BOTH modalities; (b0,b1)
    matches phash only (captions disjoint); (c0,c1) matches captions
    only (phash far apart) -> exactly one surviving pair."""
    from crawlspark.operators.payload import image_caption_neardup

    rows = [
        ("a0", 0b1010100, "red cat on a mat"),
        ("a1", 0b1010101, "red cat on a mat today"),  # hamming 1, jacc 5/6
        ("b0", 0x7777000, "alpha beta gamma"),
        ("b1", 0x7777001, "delta epsilon zeta"),  # hamming 1, jacc 0
        ("c0", 0x0F0F0F0F0F, "same exact caption here"),
        ("c1", 0x5050505050, "same exact caption here"),  # jacc 1, far phash
    ]
    df = spark.createDataFrame(rows, "image_id string, phash long, caption string")
    got = image_caption_neardup(df, max_hamming=3, min_jaccard=0.4).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in got] == [("a0", "a1", 1)]
    assert abs(got[0].jaccard - round(5 / 6, 6)) < 1e-9
