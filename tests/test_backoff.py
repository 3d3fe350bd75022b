"""Opt-in per-key error circuit breaker (extra["error_backoff"]).

A politeness key with >= threshold HTTP >= 500 results in one round is
benched for the next `rounds` rounds (server distress; 4xx never
trips). Defaults OFF — the reference has no such notion and default
schedules stay byte-identical (every other conformance test). The
pure-Python oracle mirrors the rule, so the full conformance gate
(seen set / statuses / per-domain fetch order) applies with the flag
on; rounds where everything pending is benched are IDLE ticks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark import corpus as C
from crawlspark.config import CrawlConfig
from crawlspark.engine import CrawlEngine
from crawlspark.oracle import OracleCrawl

BACKOFF = {"threshold": 1, "rounds": 3}


@pytest.fixture(scope="module")
def bo_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("bo_corpus")
    # i % 83 == 3 pages carry HTTP 500 (corpus.py status mix): n=120
    # plants 5xx pages at i=3 and i=86 in two Zipfian domains
    C.write_corpus(str(d), C.CorpusSpec(n_pages=120, n_domains=8, seed=13))
    return str(d)


def _conformance(eng, ora):
    rows = eng.all_rows().select(
        "url", "status", "registered_domain", "completed_round"
    ).collect()
    e_status = {r["url"]: r["status"] for r in rows}
    o_status = {r.url: r.status for r in ora.rows.values()}
    assert set(e_status) == set(o_status)
    diffs = {
        u: (e_status[u], o_status[u]) for u in e_status if e_status[u] != o_status[u]
    }
    assert not diffs, dict(list(diffs.items())[:10])
    e_order: dict[str, list[str]] = {}
    for r in sorted(
        [r for r in rows if r["completed_round"] is not None],
        key=lambda r: (r["registered_domain"], r["completed_round"]),
    ):
        e_order.setdefault(r["registered_domain"], []).append(r["url"])
    for dom, urls in ora.fetch_order.items():
        assert e_order.get(dom, []) == urls, dom
    return rows


def test_engine_matches_oracle_with_backoff(spark, bo_corpus, tmp_path_factory):
    cfg = CrawlConfig(
        allowed_url_patterns=C.ALLOWED_PATTERNS, extra={"error_backoff": BACKOFF}
    )
    eng = CrawlEngine(
        spark, cfg, bo_corpus,
        str(tmp_path_factory.mktemp("bo_state")), checkpoint_interval=50,
    )
    eng.start(resume=False)
    eng.run()
    ora = OracleCrawl(bo_corpus, cfg)
    ora.run()
    rows = _conformance(eng, ora)

    # the breaker really benched the 5xx keys: after the round a 500
    # landed, that key fetches nothing for `rounds` rounds
    pages = spark.read.parquet(f"{bo_corpus}/pages.parquet")
    urls5 = {
        r["canonical_url"]
        for r in pages.filter(F.col("status") >= 500)
        .select("canonical_url")
        .collect()
    }
    assert urls5, "corpus must plant at least one 5xx page"
    by_dom_rounds = {}
    for r in rows:
        if r["completed_round"] is not None:
            by_dom_rounds.setdefault(r["registered_domain"], []).append(
                r["completed_round"]
            )
    err_round = {
        r["registered_domain"]: r["completed_round"]
        for r in rows
        if r["url"] in urls5 and r["completed_round"] is not None
    }
    benched = 0
    for dom, er in err_round.items():
        later = [x for x in by_dom_rounds.get(dom, []) if x > er]
        if later:  # key had more pending — the gap must be the bench
            assert min(later) > er + BACKOFF["rounds"], (dom, er, sorted(later)[:3])
            benched += 1
    assert benched >= 1, "at least one benched key must have resumed"

    # and the flag genuinely changed the schedule vs a no-backoff run
    base = OracleCrawl(
        bo_corpus, CrawlConfig(allowed_url_patterns=C.ALLOWED_PATTERNS)
    )
    base.run()
    assert dict(ora.fetch_order) != dict(base.fetch_order)
