"""Two-level manifests (VERDICT r4 #7): tables past GROUP_SIZE files
shard their entries into content-hash-named group manifests; the
snapshot JSON stores O(groups) refs, appends reuse unchanged groups
verbatim (and skip re-reading footers of already-scanned dirs), and
expiry GCs unreferenced group files. Small tables stay inline — the
single-level layout is byte-unchanged for them (every other icelite
suite pins that)."""

from __future__ import annotations

import json
import os

import pytest

import crawlspark.icelite.table as TB
from crawlspark.icelite import IceliteCatalog


@pytest.fixture(autouse=True)
def tiny_groups(monkeypatch):
    monkeypatch.setattr(TB, "GROUP_SIZE", 4)


def _write_part(spark, path: str, lo: int, hi: int, files: int = 1):
    df = spark.range(lo, hi).selectExpr(
        "id as url_hash", "id as discovery_seq", "cast(id as string) as url"
    )
    df.repartition(files).write.mode("overwrite").parquet(path)


def test_grouped_commit_roundtrip_reuse_and_gc(spark, tmp_path):
    cat = IceliteCatalog(str(tmp_path / "cat"))
    parts = []
    for i in range(3):
        p = str(tmp_path / f"part{i}")
        _write_part(spark, p, i * 10, i * 10 + 10, files=3)  # 9 files > 4
        parts.append(p)
    s0 = cat.commit({"t": list(parts)}, meta={})

    # grouped: no inline files, O(groups) refs with counts + rows
    info = s0.tables["t"]
    assert "files" not in info and info["file_groups"]
    assert sum(r["n_files"] for r in info["file_groups"]) == 9
    entries = cat.files(s0, "t")
    assert len(entries) == 9 and all(e["rows"] == 10 // 3 + (1 if i < 10 % 3 else 0) or e["rows"] for i, e in enumerate(entries))
    assert sum(e["rows"] for e in entries) == 30
    # snapshot JSON itself carries only the refs
    raw = json.loads(s0.to_json())
    assert "files" not in raw["tables"]["t"]

    # append commit: previously-scanned dirs reuse their entries, and
    # every FULL unchanged group manifest is referenced verbatim
    p3 = str(tmp_path / "part3")
    _write_part(spark, p3, 100, 110, files=3)
    orig_scan = TB.scan_parquet_stats
    scanned = []

    def spy(path, cols=None):
        scanned.append(path)
        return orig_scan(path, cols)

    TB.scan_parquet_stats = spy
    try:
        s1 = cat.commit({"t": parts + [p3]}, meta={})
    finally:
        TB.scan_parquet_stats = orig_scan
    assert all("part3" in p for p in scanned), scanned  # O(new dirs) I/O
    refs0 = [r["manifest"] for r in s0.tables["t"]["file_groups"]]
    refs1 = [r["manifest"] for r in s1.tables["t"]["file_groups"]]
    # 9 files → groups of 4: [4,4,1]; 12 files → [4,4,4]: the two full
    # prefix groups are reused, the tail is rewritten
    assert refs1[:2] == refs0[:2] and refs1[2:] != refs0[2:]
    assert len(cat.files(s1, "t")) == 12
    assert sum(e["rows"] for e in cat.files(s1, "t")) == 40
    # seq inheritance across the reuse path: old files keep commit-0's
    # seq, the appended dir's files carry commit-1's
    assert {e["seq"] for e in cat.files(s1, "t")} == {0, 1}

    # load plans from group entries; changelog diffs via the accessor
    assert cat.load(spark, s1, "t").count() == 40
    delta = cat.changelog(spark, s0, s1, "t")
    assert delta.count() == 10

    # lineage_df derives the added flag from seq for grouped tables
    lf = {r["file"]: r["added"] for r in cat.lineage_df(spark, s1).collect()}
    assert sum(lf.values()) == 3 and all(
        ("part3" in f) == a for f, a in lf.items()
    )

    # equality deletes ride grouped entries (sequence rule intact)
    keys = spark.range(0, 5).selectExpr("id as url_hash")
    s2 = cat.commit_delete("t", keys, ["url_hash"])
    assert cat.load(spark, cat.snapshot(s2.snapshot_id), "t").count() == 35

    # pruning reads bounds from group entries
    pruned = cat.prune_files(s2, "t", "url_hash", 100, 200)
    assert pruned is not None and 0 < len(pruned) < 12

    # expiry sweeps group manifests no surviving snapshot references
    gdir = os.path.join(cat.root, "manifests", "groups")
    n_groups_before = len(os.listdir(gdir))
    res = cat.expire_snapshots(keep_last=1)
    assert res["expired_manifests"] == 2
    live = {
        os.path.basename(r["manifest"])
        for r in cat.latest().tables["t"]["file_groups"]
    }
    assert set(os.listdir(gdir)) == live
    assert res["removed_group_manifests"] == n_groups_before - len(live)
    # the surviving snapshot still reads fine after the sweep
    cat._group_cache.clear()
    assert cat.load(spark, cat.latest(), "t").count() == 35
