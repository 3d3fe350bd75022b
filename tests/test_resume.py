"""Resume-from-snapshot equals uninterrupted run (SURVEY.md §5.4,
mirrors tests/worker_test.py:175-192 in the reference)."""

from __future__ import annotations

from crawlspark import corpus as C
from crawlspark.config import CrawlConfig
from crawlspark.engine import CrawlEngine
from crawlspark.reports import crawl_report


def test_resume_equals_uninterrupted(spark, tmp_path):
    d = str(tmp_path / "corpus")
    C.write_corpus(d, C.CorpusSpec(n_pages=36, n_domains=8, seed=13))
    cfg = CrawlConfig(allowed_url_patterns=C.ALLOWED_PATTERNS, per_domain_quota=2)

    a = CrawlEngine(spark, cfg, d, str(tmp_path / "sa"), checkpoint_interval=2)
    a.start(resume=False)
    a.run()

    b1 = CrawlEngine(spark, cfg, d, str(tmp_path / "sb"), checkpoint_interval=2)
    b1.start(resume=False)
    for _ in range(5):
        b1.run_round()
    del b1  # crash: snapshot cadence 2 → rounds 5 state is lost

    b2 = CrawlEngine(spark, cfg, d, str(tmp_path / "sb"), checkpoint_interval=2)
    b2.start(resume=True)
    assert b2.round_no in (4, 5)
    b2.run()

    ea = {r["url"]: r["status"] for r in a.all_rows().select("url", "status").collect()}
    eb = {r["url"]: r["status"] for r in b2.all_rows().select("url", "status").collect()}
    assert ea == eb
    assert crawl_report(a.all_rows(), a.pages) == crawl_report(b2.all_rows(), b2.pages)

    # per-partition lineage + metrics survive the resume (north_rule):
    # every data file in the final manifest carries rows+bytes, table rows
    # equal the sum of file rows, append-only tables record added files
    # per commit, and per-round fetch/parse metrics ride in meta
    snap = b2.catalog.latest()
    for name, info in snap.tables.items():
        files = info.get("files", [])
        for f in files:
            assert f["bytes"] > 0 and f["rows"] >= 0, (name, f)
        assert info["rows"] == sum(f["rows"] for f in files)
        assert "lineage" in info
    comp = snap.tables["completed"]
    assert comp["lineage"]["existing"] + len(comp["lineage"]["added"]) == len(
        comp["files"]
    )
    assert comp["rows"] == b2.completed.count()
    # column bounds (Iceberg lower/upper) recorded for the stats columns
    bounded = [f for f in comp["files"] if f.get("rows") and f.get("bounds")]
    assert bounded, "no per-file column bounds in the manifest"
    f0 = bounded[0]["bounds"]
    assert "discovery_seq" in f0 and f0["discovery_seq"][0] <= f0["discovery_seq"][1]
    assert "registered_domain" in f0
    rounds_meta = snap.meta["rounds"]
    assert rounds_meta and all(
        "scheduled" in r and "by_status" in r for r in rounds_meta
    )


def test_manifest_bounds_prune_file_scans(spark, tmp_path):
    """prune_files: manifest bounds select only the data files whose
    column range intersects the predicate — the scan-planning contract
    of the per-file stats."""
    from pyspark.sql import functions as F

    from crawlspark.icelite import IceliteCatalog

    cat = IceliteCatalog(str(tmp_path / "cat"))
    # three disjoint discovery_seq ranges → three referenced delta dirs
    parts = []
    for i, (a, b) in enumerate([(0, 100), (100, 200), (200, 300)]):
        p = str(tmp_path / f"delta{i}")
        spark.range(a, b).select(
            F.col("id").alias("discovery_seq"),
            F.lit(f"d{i}.example").alias("registered_domain"),
        ).repartition(1).write.parquet(p)
        parts.append(p)
    snap = cat.commit({"frontier": parts}, meta={})

    all_files = cat.prune_files(snap, "frontier", "discovery_seq", 0, 10**9)
    assert len(all_files) == 3
    head = cat.prune_files(snap, "frontier", "discovery_seq", 0, 50)
    assert len(head) == 1
    rows = spark.read.parquet(*head).agg(F.min("discovery_seq")).first()[0]
    assert rows == 0
    mid = cat.prune_files(snap, "frontier", "discovery_seq", 150, 250)
    assert len(mid) == 2
    by_dom = cat.prune_files(snap, "frontier", "registered_domain", "d2", "d2.zzz")
    assert len(by_dom) == 1
    assert cat.prune_files(snap, "missing", "discovery_seq", 0, 1) is None
