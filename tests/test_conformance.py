"""THE conformance gate (SURVEY.md §5.2): the Spark engine and the
pure-Python oracle crawl the same corpus and must agree on the URL-seen
set, per-URL terminal status, per-domain fetch order, and the four report
outputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark import corpus as C
from crawlspark.config import CrawlConfig
from crawlspark.engine import CrawlEngine
from crawlspark.oracle import OracleCrawl
from crawlspark import reports as REP


@pytest.fixture(scope="module")
def small_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("conf_corpus")
    C.write_corpus(str(d), C.CorpusSpec(n_pages=90, n_domains=14, seed=11))
    return str(d)


@pytest.fixture(scope="module")
def cfg():
    return CrawlConfig(allowed_url_patterns=C.ALLOWED_PATTERNS)


@pytest.fixture(scope="module")
def engine(spark, small_corpus, cfg, tmp_path_factory):
    eng = CrawlEngine(
        spark, cfg, small_corpus,
        str(tmp_path_factory.mktemp("state")), checkpoint_interval=50,
    )
    eng.start(resume=False)
    eng.run()
    return eng


def test_engine_matches_oracle(engine, small_corpus, cfg):
    eng = engine
    ora = OracleCrawl(small_corpus, cfg)
    ora.run()

    rows = eng.all_rows().select(
        "url", "status", "registered_domain", "completed_round", "discovery_seq"
    ).collect()
    e_status = {r["url"]: r["status"] for r in rows}
    o_status = {r.url: r.status for r in ora.rows.values()}

    # 1. URL-seen set
    assert set(e_status) == set(o_status), (
        f"only-engine={set(e_status) - set(o_status)}  "
        f"only-oracle={set(o_status) - set(e_status)}"
    )
    # 2. per-URL terminal status
    diffs = {u: (e_status[u], o_status[u]) for u in e_status if e_status[u] != o_status[u]}
    assert not diffs, dict(list(diffs.items())[:10])

    # 3. per-domain fetch order (completed_round orders pops per domain)
    e_order: dict[str, list[str]] = {}
    for r in sorted(
        [r for r in rows if r["completed_round"] is not None],
        key=lambda r: (r["registered_domain"], r["completed_round"]),
    ):
        e_order.setdefault(r["registered_domain"], []).append(r["url"])
    for dom, urls in ora.fetch_order.items():
        assert e_order.get(dom, []) == urls, dom

    # 4. reports
    e_rep = REP.crawl_report(eng.all_rows(), eng.pages)
    o_rep = ora.report()
    assert e_rep["unique_pages"] == o_rep["unique_pages"]
    assert e_rep["subdomains"] == o_rep["subdomains"]
    assert e_rep["longest_page"] == o_rep["longest_page"]
    assert e_rep["top_words"] == o_rep["top_words"]


def test_sitemap_index_and_ruleless_coverage(engine):
    """The new corpus shapes must actually be exercised: sitemapindex
    domains (k%6==0: d00/d06/d12) admit pages via sub-sitemaps, sitemap
    DOCUMENT urls are never admitted as pages, and rule-less domains
    (k%7==5: d05/d12) are fully allowed."""
    rows = engine.all_rows().select(
        "url", "src", "status", "registered_domain"
    ).collect()
    sm_rows = [r for r in rows if r["src"] == "sitemap"]
    assert sm_rows, "no sitemap-admitted rows at all"
    idx_doms = {"d00.example", "d06.example", "d12.example"}
    assert any(r["registered_domain"] in idx_doms for r in sm_rows), (
        "no pages admitted from a sitemapindex domain"
    )
    assert not [r for r in rows if r["url"].lower().endswith(".xml")]
    for r in rows:
        if r["registered_domain"] in ("d05.example", "d12.example"):
            assert r["status"] != "robots_blocked", r


def test_engine_statuses_cover_fixtures(engine):
    """The corpus fixtures must actually exercise the routing paths."""
    seen = {
        r["status"]
        for r in engine.all_rows().select("status").distinct().collect()
    }
    for expected in ("parsed", "redirect", "error", "robots_blocked", "low_data"):
        assert expected in seen, (expected, seen)
