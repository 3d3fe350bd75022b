"""Conformance at K=3 politeness quota with the bloom seen-filter ON —
exercises the salted two-phase top-K scheduler and proves the bloom
pre-filter doesn't change semantics (exactness contract)."""

from __future__ import annotations

import pytest

from crawlspark import corpus as C
from crawlspark.config import CrawlConfig
from crawlspark.engine import CrawlEngine
from crawlspark.oracle import OracleCrawl


@pytest.fixture(scope="module")
def corpus_k3(tmp_path_factory):
    d = tmp_path_factory.mktemp("conf_k3")
    C.write_corpus(str(d), C.CorpusSpec(n_pages=80, n_domains=10, seed=23))
    return str(d)


def test_k3_bloom_matches_oracle(spark, corpus_k3, tmp_path_factory):
    cfg = CrawlConfig(
        allowed_url_patterns=C.ALLOWED_PATTERNS,
        per_domain_quota=3,
        extra={"use_bloom": True, "bloom_keys_per_bucket": 1000},
    )
    eng = CrawlEngine(
        spark, cfg, corpus_k3,
        str(tmp_path_factory.mktemp("state_k3")), checkpoint_interval=100,
    )
    eng.start(resume=False)
    eng.run()

    ora = OracleCrawl(corpus_k3, cfg)
    ora.run()

    rows = eng.all_rows().select("url", "status", "registered_domain", "completed_round", "discovery_seq").collect()
    e_status = {r["url"]: r["status"] for r in rows}
    o_status = {r.url: r.status for r in ora.rows.values()}
    assert set(e_status) == set(o_status), (
        len(set(e_status) - set(o_status)), len(set(o_status) - set(e_status))
    )
    diffs = {u: (e_status[u], o_status[u]) for u in e_status if e_status[u] != o_status[u]}
    assert not diffs, dict(list(diffs.items())[:5])

    # per-domain fetch order: within a round, K=3 pops are ordered by seq
    e_order: dict[str, list[str]] = {}
    for r in sorted(
        [r for r in rows if r["completed_round"] is not None],
        key=lambda r: (r["registered_domain"], r["completed_round"], r["discovery_seq"]),
    ):
        e_order.setdefault(r["registered_domain"], []).append(r["url"])
    for dom, urls in ora.fetch_order.items():
        assert e_order.get(dom, []) == urls, dom
