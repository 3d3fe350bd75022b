"""Iceberg-v2-style equality deletes in icelite: merge-on-read
anti-joins scoped by sequence number (a delete only filters data files
committed before it), delete files surviving snapshot expiry, and
DataFrame rewrites compacting deletes away."""

from __future__ import annotations

import os

import pytest

from crawlspark.icelite import IceliteCatalog


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


@pytest.fixture()
def cat(spark, tmp_path):
    root = str(tmp_path / "cat")
    d0 = str(tmp_path / "delta0")
    spark.createDataFrame(
        [(k, f"v{k}") for k in range(1, 7)], ["k", "v"]
    ).coalesce(1).write.parquet(d0)
    c = IceliteCatalog(root)
    c.commit({"t": [d0]}, {"round": 0})
    return c, d0, tmp_path


def test_equality_delete_merge_on_read(spark, cat):
    c, d0, tmp_path = cat
    c.commit_delete("t", spark.createDataFrame([(2,), (4,)], ["k"]), ["k"])
    got = c.load(spark, c.latest(), "t")
    assert _rows(got) == [(1, "v1"), (3, "v3"), (5, "v5"), (6, "v6")]
    # no data file was rewritten: the delete commit lists the same files
    info = c.latest().tables["t"]
    assert info["lineage"]["added"] == [] and info["lineage"]["existing"] == 1
    assert info["deletes"][0]["rows"] == 2


def test_sequence_rule_reappend_survives(spark, cat):
    c, d0, tmp_path = cat
    snap_del = c.commit_delete(
        "t", spark.createDataFrame([(2,), (4,)], ["k"]), ["k"]
    )
    # re-append k=2 AFTER the delete: the new file's seq postdates the
    # delete, so the fresh row must survive merge-on-read
    d1 = str(tmp_path / "delta1")
    spark.createDataFrame([(2, "v2_new")], ["k", "v"]).coalesce(1).write.parquet(d1)
    c.commit({"t": [d0, d1]}, {"round": 1})
    assert _rows(c.load(spark, c.latest(), "t")) == [
        (1, "v1"), (2, "v2_new"), (3, "v3"), (5, "v5"), (6, "v6"),
    ]
    # a SECOND delete hits both generations (its seq postdates both)
    c.commit_delete("t", spark.createDataFrame([(2,), (5,)], ["k"]), ["k"])
    assert _rows(c.load(spark, c.latest(), "t")) == [
        (1, "v1"), (3, "v3"), (6, "v6"),
    ]
    # time travel: the first-delete snapshot still reads its own view
    assert _rows(c.load(spark, c.snapshot(snap_del.snapshot_id), "t")) == [
        (1, "v1"), (3, "v3"), (5, "v5"), (6, "v6"),
    ]


def test_expiry_keeps_live_delete_files(spark, cat):
    c, d0, tmp_path = cat
    c.commit_delete("t", spark.createDataFrame([(3,)], ["k"]), ["k"])
    c.commit({"t": [d0]}, {"round": 1})  # append commit inherits the delete
    out = c.expire_snapshots(keep_last=1)
    assert out["expired_manifests"] == 2
    dpath = os.path.join(c.root, c.latest().tables["t"]["deletes"][0]["path"])
    assert os.path.isdir(dpath), "live equality-delete file was swept"
    assert _rows(c.load(spark, c.latest(), "t")) == [
        (1, "v1"), (2, "v2"), (4, "v4"), (5, "v5"), (6, "v6"),
    ]


def test_rewrite_compacts_deletes(spark, cat):
    c, d0, tmp_path = cat
    c.commit_delete("t", spark.createDataFrame([(1,), (6,)], ["k"]), ["k"])
    merged = c.load(spark, c.latest(), "t")
    c.commit({"t": merged}, {"round": 1})
    info = c.latest().tables["t"]
    assert "deletes" not in info
    assert _rows(c.load(spark, c.latest(), "t")) == [
        (2, "v2"), (3, "v3"), (4, "v4"), (5, "v5"),
    ]


def test_delete_on_missing_table_raises(spark, cat):
    c, _, _ = cat
    with pytest.raises(KeyError):
        c.commit_delete("nope", spark.createDataFrame([(1,)], ["k"]), ["k"])
