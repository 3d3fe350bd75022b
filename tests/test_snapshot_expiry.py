"""icelite snapshot expiry + orphan-file GC (VERDICT r3 #4): after
``expire_snapshots(keep_last=N)`` the latest snapshot still resumes
byte-identically and expired data files are gone from disk."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from crawlspark import corpus as C
from crawlspark.config import CrawlConfig
from crawlspark.engine import CrawlEngine
from crawlspark.icelite import IceliteCatalog
from crawlspark.reports import crawl_report


def _snap_data_dirs(root: str) -> set[str]:
    ddir = os.path.join(root, "data")
    out = set()
    if not os.path.isdir(ddir):
        return out
    for snapdir in os.listdir(ddir):
        sd = os.path.join(ddir, snapdir)
        if os.path.isdir(sd):
            for t in os.listdir(sd):
                out.add(os.path.join(snapdir, t))
    return out


def test_catalog_expiry_keeps_latest_and_sweeps_orphans(spark, tmp_path):
    cat = IceliteCatalog(str(tmp_path / "cat"))
    for i in range(3):
        cat.commit({"t": spark.range(10 * (i + 1)).select(F.col("id"))}, meta={"i": i})

    # a crashed commit strands a data dir with no manifest — orphan
    orphan = os.path.join(cat.root, "data", "snap-000099", "t")
    spark.range(5).write.parquet(orphan)

    assert len(_snap_data_dirs(cat.root)) == 4
    res = cat.expire_snapshots(keep_last=1)
    assert res["expired_manifests"] == 2
    assert res["removed_data_dirs"] == 3  # two expired + the orphan

    mdir = os.path.join(cat.root, "manifests")
    # "groups" is the two-level manifest dir, always present (and empty
    # here — small tables stay inline)
    assert sorted(os.listdir(mdir)) == ["groups", "snapshot-000002.json"]
    assert os.listdir(os.path.join(mdir, "groups")) == []
    assert _snap_data_dirs(cat.root) == {os.path.join("snap-000002", "t")}

    snap = cat.latest()
    assert snap.snapshot_id == 2
    assert cat.load(spark, snap, "t").count() == 30

    # idempotent: a second expiry is a no-op
    res2 = cat.expire_snapshots(keep_last=1)
    assert res2["expired_manifests"] == 0 and res2["removed_data_dirs"] == 0


def test_rollback_points_current_at_retained_snapshot(spark, tmp_path):
    import pytest

    cat = IceliteCatalog(str(tmp_path / "cat"))
    for i in range(3):
        cat.commit({"t": spark.range(10 * (i + 1))}, meta={"i": i})
    assert cat.latest().snapshot_id == 2

    snap = cat.rollback(1)
    assert snap.snapshot_id == 1
    assert cat.latest().snapshot_id == 1
    assert cat.load(spark, cat.latest(), "t").count() == 20

    # diverge: the next commit takes id 2 again (the abandoned branch is
    # overwritten) and becomes current
    cat.commit({"t": spark.range(5)}, meta={"i": "diverged"})
    cur = cat.latest()
    assert cur.snapshot_id == 2 and cur.parent_id == 1
    assert cat.load(spark, cur, "t").count() == 5

    # expired targets are refused
    cat.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        cat.rollback(0)


def test_engine_rollback_then_rerun_reconverges(spark, tmp_path):
    """Roll a crawl back two rounds and re-run: the deterministic engine
    reconverges to the uninterrupted run's exact final state — the
    time-travel/repair workflow the snapshot layer exists for."""
    d = str(tmp_path / "corpus")
    C.write_corpus(d, C.CorpusSpec(n_pages=36, n_domains=8, seed=13))
    cfg = CrawlConfig(allowed_url_patterns=C.ALLOWED_PATTERNS, per_domain_quota=2)

    a = CrawlEngine(spark, cfg, d, str(tmp_path / "sa"), checkpoint_interval=2)
    a.start(resume=False)
    a.run()

    b1 = CrawlEngine(spark, cfg, d, str(tmp_path / "sb"), checkpoint_interval=2)
    b1.start(resume=False)
    b1.run()
    root = b1.catalog.root
    del b1

    b2 = CrawlEngine(spark, cfg, d, str(tmp_path / "sb"), checkpoint_interval=2)
    # roll back to the FIRST retained snapshot, then resume + re-run
    import os as _os

    mdir = _os.path.join(root, "manifests")
    snaps = sorted(f for f in _os.listdir(mdir) if f.startswith("snapshot-"))
    first_sid = int(snaps[0].split("-")[1].split(".")[0])
    b2.catalog.rollback(first_sid)
    b2.start(resume=True)
    assert b2.round_no <= a.round_no
    b2.run()

    ea = {r["url"]: r["status"] for r in a.all_rows().select("url", "status").collect()}
    eb = {r["url"]: r["status"] for r in b2.all_rows().select("url", "status").collect()}
    assert ea == eb
    assert crawl_report(a.all_rows(), a.pages) == crawl_report(b2.all_rows(), b2.pages)


def test_resume_after_expiry_equals_uninterrupted(spark, tmp_path):
    d = str(tmp_path / "corpus")
    C.write_corpus(d, C.CorpusSpec(n_pages=36, n_domains=8, seed=13))
    cfg = CrawlConfig(allowed_url_patterns=C.ALLOWED_PATTERNS, per_domain_quota=2)
    cfg_exp = CrawlConfig(
        allowed_url_patterns=C.ALLOWED_PATTERNS,
        per_domain_quota=2,
        extra={"snapshot_keep_last": 1},
    )

    a = CrawlEngine(spark, cfg, d, str(tmp_path / "sa"), checkpoint_interval=2)
    a.start(resume=False)
    a.run()

    b1 = CrawlEngine(spark, cfg_exp, d, str(tmp_path / "sb"), checkpoint_interval=2)
    b1.start(resume=False)
    for _ in range(5):
        b1.run_round()
    root = b1.catalog.root
    mdir = os.path.join(root, "manifests")
    # expiry ran at each commit: exactly one manifest survives, and every
    # surviving pending data dir belongs to it
    assert len([f for f in os.listdir(mdir) if f.startswith("snapshot-")]) == 1
    kept = {p.split(os.sep)[0] for p in _snap_data_dirs(root)}
    cur_sid = b1.catalog.latest().snapshot_id
    assert kept == {f"snap-{cur_sid:06d}"}
    del b1  # crash: snapshot cadence 2 → round-5 state is lost

    b2 = CrawlEngine(spark, cfg_exp, d, str(tmp_path / "sb"), checkpoint_interval=2)
    b2.start(resume=True)
    assert b2.round_no in (4, 5)
    b2.run()

    ea = {r["url"]: r["status"] for r in a.all_rows().select("url", "status").collect()}
    eb = {r["url"]: r["status"] for r in b2.all_rows().select("url", "status").collect()}
    assert ea == eb
    assert crawl_report(a.all_rows(), a.pages) == crawl_report(b2.all_rows(), b2.pages)
