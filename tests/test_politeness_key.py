"""politeness_key='netloc' conformance (VERDICT r2 #4): the reference
keys its per-domain queues on netloc (crawler/frontier.py:42), so sibling
subdomains of one registered domain fetch in the SAME politeness tick.
The engine's default (registered_domain) is stricter; this fixture pins
the netloc mode against the oracle on a multi-subdomain corpus."""

from __future__ import annotations

import pytest

from crawlspark import corpus as C
from crawlspark.config import CrawlConfig
from crawlspark.engine import CrawlEngine
from crawlspark.oracle import OracleCrawl


@pytest.fixture(scope="module")
def netloc_setup(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("netloc_corpus")
    # the corpus host generator emits s1/s2/s3 subdomains (corpus._host),
    # so registered domains have up to 4 netlocs
    C.write_corpus(str(d), C.CorpusSpec(n_pages=80, n_domains=8, seed=7))
    cfg = CrawlConfig(
        allowed_url_patterns=C.ALLOWED_PATTERNS,
        extra={"politeness_key": "netloc"},
    )
    eng = CrawlEngine(
        spark, cfg, str(d), str(tmp_path_factory.mktemp("netloc_state")),
        checkpoint_interval=50,
    )
    eng.start(resume=False)
    eng.run()
    ora = OracleCrawl(str(d), cfg)
    ora.run()
    return eng, ora


def test_netloc_engine_matches_oracle(netloc_setup):
    eng, ora = netloc_setup
    rows = eng.all_rows().select(
        "url", "status", "host", "completed_round", "discovery_seq"
    ).collect()
    e_status = {r["url"]: r["status"] for r in rows}
    o_status = {r.url: r.status for r in ora.rows.values()}
    assert set(e_status) == set(o_status), (
        f"only-engine={set(e_status) - set(o_status)}  "
        f"only-oracle={set(o_status) - set(e_status)}"
    )
    diffs = {u: (e_status[u], o_status[u]) for u in e_status if e_status[u] != o_status[u]}
    assert not diffs, dict(list(diffs.items())[:10])

    # per-HOST fetch order (netloc keying pops <=1 per host per round)
    o_rows = {r.url: r for r in ora.rows.values()}
    e_order: dict[str, list[str]] = {}
    for r in sorted(
        [r for r in rows if r["completed_round"] is not None],
        key=lambda r: (r["host"], r["completed_round"]),
    ):
        e_order.setdefault(r["host"], []).append(r["url"])
    o_order: dict[str, list[str]] = {}
    for r in sorted(
        [r for r in o_rows.values() if r.completed_round is not None],
        key=lambda r: (r.host, r.completed_round),
    ):
        o_order.setdefault(r.host, []).append(r.url)
    assert e_order == o_order


def test_netloc_fixture_exercises_parallel_subdomains(netloc_setup):
    """Sanity: the fixture must contain a round where two netlocs of ONE
    registered domain completed together — the observable difference from
    registered_domain keying."""
    eng, _ = netloc_setup
    rows = eng.all_rows().select(
        "host", "registered_domain", "completed_round"
    ).collect()
    by_round_dom: dict[tuple, set] = {}
    for r in rows:
        if r["completed_round"] is None:
            continue
        by_round_dom.setdefault(
            (r["completed_round"], r["registered_domain"]), set()
        ).add(r["host"])
    assert any(len(hosts) >= 2 for hosts in by_round_dom.values()), (
        "no round fetched two subdomains of one registered domain"
    )
