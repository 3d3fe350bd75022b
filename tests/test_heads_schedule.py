"""Stats-pruned frontier-heads scheduling (VERDICT r2 #1): the schedule
must read only per-key head files of the sorted compacted layout (plus
deltas + tombstones) and still produce byte-identical crawls."""

from __future__ import annotations

import tempfile

import pytest

from crawlspark import benchcorpus as BC
from crawlspark.config import CrawlConfig
from crawlspark.engine import CrawlEngine
from crawlspark.operators.robots import parse_robots
from crawlspark.operators.schedule import select_head_files


def _entry(f, rows, d_lo, d_hi, s_lo, s_hi):
    return {
        "file": f, "rows": rows,
        "bounds": {
            "registered_domain": [d_lo, d_hi],
            "discovery_seq": [s_lo, s_hi],
        },
    }


def test_select_head_files_unit():
    # layout: f0 mixed (a..b), f1/f2/f3 pure-b continuations, f4 mixed (b..c)
    entries = [
        _entry("f0", 100, "a", "b", 0, 99),
        _entry("f1", 100, "b", "b", 100, 199),
        _entry("f2", 100, "b", "b", 200, 299),
        _entry("f3", 100, "b", "b", 300, 399),
        _entry("f4", 100, "b", "c", 400, 499),
    ]
    kept, pruned = select_head_files(entries, budget=1)
    # f0 mixed → kept (holds a's and b's heads); f1 kept (first confirmed-b
    # rows — f0 is mixed so its b-count is unknown); f2/f3 pruned once 100
    # confirmed b-rows are covered; f4 mixed → kept (holds c's head)
    assert [e["file"] for e in kept] == ["f0", "f1", "f4"]
    assert [e["file"] for e in pruned] == ["f2", "f3"]

    # a larger budget keeps more continuation rows readable
    kept, pruned = select_head_files(entries, budget=150)
    assert [e["file"] for e in kept] == ["f0", "f1", "f2", "f4"]

    # missing bounds anywhere → no pruning at all (never prune blind)
    broken = entries[:2] + [{"file": "fX", "rows": 10}]
    assert select_head_files(broken, budget=1) is None

    # rows=None (unreadable footer) also aborts
    bad = [dict(e) for e in entries]
    bad[2]["rows"] = None
    assert select_head_files(bad, budget=1) is None


def test_select_head_files_tail_stats_and_interleaved_seqs():
    # discovery_seq interleaves across keys, so a mixed file's column-wise
    # s_lo carries its TAIL key's low seqs — the walk must follow the
    # tuple-range order (k_hi, k_lo, s_lo), or the mixed file mis-sorts
    # ahead of its head key's pure files and the tail run is lost
    entries = [
        _entry("p00", 100, "a", "a", 2, 900),
        _entry("p01", 100, "a", "a", 905, 2000),
        _entry("p02", 100, "a", "b", 3, 2500),    # b's head inside; b seqs from 3
        _entry("p03", 100, "b", "b", 40, 3000),
        _entry("p04", 100, "b", "c", 1, 3500),    # c's head inside; c seqs from 1
        _entry("p05", 100, "c", "c", 50, 4000),
    ]
    # with tail-key row counts (compaction stats): every pure continuation
    # after a mixed file prunes — the scan is exactly the head files
    for e, t in zip(entries, (100, 100, 30, 100, 25, 100)):
        e["tail_rows"] = t
    kept, pruned = select_head_files(entries, budget=1)
    assert [e["file"] for e in kept] == ["p00", "p02", "p04"]
    assert [e["file"] for e in pruned] == ["p01", "p03", "p05"]

    # budget larger than the mixed file's confirmed tail rows → the next
    # continuation stays readable
    kept, _ = select_head_files(entries, budget=31)
    assert [e["file"] for e in kept] == ["p00", "p02", "p03", "p04", "p05"]

    # without tail stats: conservative (+1 continuation file per mixed
    # file) but still correct under the range order
    for e in entries:
        del e["tail_rows"]
    kept, pruned = select_head_files(entries, budget=1)
    assert [e["file"] for e in kept] == ["p00", "p02", "p03", "p04", "p05"]
    assert [e["file"] for e in pruned] == ["p01"]


def _run_crawl(spark, heads: bool, quota: int, rounds: int = 6,
               politeness_key: str | None = None,
               heads_mode: str | None = None,
               heads_refresh_rounds: int | None = None):
    n_pages, n_domains = 4000, 6
    pages = BC.build_pages(spark, n_pages, n_domains)
    frontier = BC.build_frontier(spark, n_pages, n_domains)
    robots = BC.build_robots(spark, n_domains)
    extra = {"heads_scheduling": heads, "pending_file_rows": 200}
    if politeness_key:
        extra["politeness_key"] = politeness_key
    if heads_mode:
        extra["heads_mode"] = heads_mode
    if heads_refresh_rounds:
        extra["heads_refresh_rounds"] = heads_refresh_rounds
    cfg = CrawlConfig(
        allowed_url_patterns=(r"https?://[a-z0-9.-]*\.example(/|$)",),
        per_domain_quota=quota,
        extra=extra,
    )
    eng = CrawlEngine(
        spark, cfg, None, tempfile.mkdtemp(prefix="heads_"),
        checkpoint_interval=3, pages=pages, robots_bodies=robots,
        sitemap_xml=spark.createDataFrame([], "registered_domain string, xml string"),
    )
    eng.start_from_frontier(frontier, parse_robots(robots), next_seq=n_pages)
    for _ in range(rounds):
        if not eng.run_round():
            break
    rows = {
        r["url"]: (r["status"], r["completed_round"], r["discovery_seq"])
        for r in eng.all_rows().select(
            "url", "status", "completed_round", "discovery_seq"
        ).collect()
    }
    return eng, rows


@pytest.mark.parametrize(
    "quota,key",
    [(1, None), (2, None), (8, "netloc")],
)
def test_heads_schedule_equals_full_scan(spark, quota, key):
    """Same crawl with heads pruning ON vs OFF: identical per-URL status,
    completion round and sequence — across compactions, snapshot commits
    (interval 3) and accumulating tombstones (the budget logic). The
    (8, netloc) cell exercises the K-dependent budget math on the
    finer-grained politeness key (VERDICT r3 #7)."""
    eng_on, rows_on = _run_crawl(spark, heads=True, quota=quota, politeness_key=key)
    _, rows_off = _run_crawl(spark, heads=False, quota=quota, politeness_key=key)
    assert rows_on == rows_off
    # the pruned path must have actually run AND pruned on this layout
    scans = [r.sched_scan for r in eng_on.stats.rounds if r.sched_scan]
    assert scans, "heads scheduling never engaged"
    assert any(s["files_pruned"] > 0 for s in scans), scans
    assert all(
        s["base_rows_scanned"] <= s["base_rows_total"] for s in scans
    )
    pruned_rounds = [s for s in scans if s["files_pruned"] > 0]
    assert all(
        s["base_rows_scanned"] < s["base_rows_total"] for s in pruned_rounds
    )


def test_heads_schedule_survives_resume(spark):
    """A resumed engine picks up the snapshot's sorted layout and keeps
    pruning; the crawl completes identically to an unbroken run."""
    n_pages, n_domains = 3000, 5
    pages = BC.build_pages(spark, n_pages, n_domains)
    frontier = BC.build_frontier(spark, n_pages, n_domains)
    robots = BC.build_robots(spark, n_domains)
    rules = parse_robots(robots)
    cfg = CrawlConfig(
        allowed_url_patterns=(r"https?://[a-z0-9.-]*\.example(/|$)",),
        extra={"pending_file_rows": 200},
    )
    state = tempfile.mkdtemp(prefix="heads_resume_")

    eng1 = CrawlEngine(
        spark, cfg, None, state, checkpoint_interval=2, pages=pages,
        robots_bodies=robots,
        sitemap_xml=spark.createDataFrame([], "registered_domain string, xml string"),
    )
    eng1.start_from_frontier(frontier, rules, next_seq=n_pages)
    for _ in range(4):
        eng1.run_round()
    eng1._commit_snapshot()

    eng2 = CrawlEngine(
        spark, cfg, None, state, checkpoint_interval=2, pages=pages,
        robots_bodies=robots,
        sitemap_xml=spark.createDataFrame([], "registered_domain string, xml string"),
    )
    eng2.start(resume=True)
    assert eng2._sorted_base is not None

    # snapshot-backed base: file stats must come from the icelite
    # MANIFEST (Iceberg scan planning), not parquet footers — prove it by
    # making the footer path explode
    import crawlspark.engine as ENG

    orig = ENG.scan_parquet_stats

    def boom(path):
        raise RuntimeError("footer scan must not run for snapshot-backed base")

    ENG.scan_parquet_stats = boom
    try:
        entries = eng2._file_stats(eng2._sorted_base)
    finally:
        ENG.scan_parquet_stats = orig
    assert entries and all(
        "bounds" in e and e["rows"] is not None for e in entries
    )
    # the snapshot commit's file annotator recorded tail-key row counts,
    # so exact (non-conservative) pruning survives resume too
    assert all("tail_rows" in e for e in entries)

    eng2.run_round()
    scan = eng2.stats.rounds[-1].sched_scan
    assert scan is not None and scan["files_pruned"] > 0


@pytest.mark.parametrize(
    "quota,key,refresh",
    [(1, None, 3), (2, None, 2), (8, "netloc", 3)],
)
def test_heads_table_equals_full_scan(spark, quota, key, refresh):
    """heads_mode='table' (VERDICT r4 #3 — the many-keys regime): the
    per-key HEADS table + admission deltas − tombstones must schedule
    byte-identically to the full scan, across mid-crawl rebuilds (tiny
    refresh windows force several), snapshot commits (interval 3 rewrites
    the parts list → invalidation) and accumulating tombstones."""
    eng_on, rows_on = _run_crawl(
        spark, heads=False, quota=quota, politeness_key=key,
        heads_mode="table", heads_refresh_rounds=refresh,
    )
    _, rows_off = _run_crawl(spark, heads=False, quota=quota, politeness_key=key)
    assert rows_on == rows_off
    scans = [r.sched_scan for r in eng_on.stats.rounds if r.sched_scan]
    assert scans and all(s.get("mode") == "table" for s in scans)
    # once the frontier is deeper than #keys × B, the tick must NOT have
    # scanned the whole frontier
    assert any(
        s["base_rows_scanned"] < s["base_rows_total"] for s in scans
    ), scans


def test_heads_table_survives_resume(spark):
    """Crash + resume under heads_mode='table': the table is scratch-only
    (never snapshot-carried) and must rebuild lazily on the first resumed
    tick, completing the crawl identically to an unbroken run."""
    n_pages, n_domains = 3000, 5
    pages = BC.build_pages(spark, n_pages, n_domains)
    frontier = BC.build_frontier(spark, n_pages, n_domains)
    robots = BC.build_robots(spark, n_domains)
    rules = parse_robots(robots)
    cfg = CrawlConfig(
        allowed_url_patterns=(r"https?://[a-z0-9.-]*\.example(/|$)",),
        extra={"pending_file_rows": 200, "heads_mode": "table",
               "heads_refresh_rounds": 3},
    )

    def eng_for(state):
        return CrawlEngine(
            spark, cfg, None, state, checkpoint_interval=2, pages=pages,
            robots_bodies=robots,
            sitemap_xml=spark.createDataFrame(
                [], "registered_domain string, xml string"
            ),
        )

    sa = tempfile.mkdtemp(prefix="headstab_a_")
    a = eng_for(sa)
    a.start_from_frontier(frontier, rules, next_seq=n_pages)
    for _ in range(8):
        a.run_round()

    sb = tempfile.mkdtemp(prefix="headstab_b_")
    b1 = eng_for(sb)
    b1.start_from_frontier(frontier, rules, next_seq=n_pages)
    for _ in range(4):
        b1.run_round()
    b1._commit_snapshot()
    del b1  # crash mid-crawl

    b2 = eng_for(sb)
    b2.start(resume=True)
    assert b2._heads_df is None  # rebuilds lazily on the first tick
    for _ in range(4):
        b2.run_round()

    cols = ["url", "status", "completed_round", "discovery_seq"]
    ra = {r["url"]: (r["status"], r["completed_round"], r["discovery_seq"])
          for r in a.all_rows().select(*cols).collect()}
    rb = {r["url"]: (r["status"], r["completed_round"], r["discovery_seq"])
          for r in b2.all_rows().select(*cols).collect()}
    assert ra == rb
