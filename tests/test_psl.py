"""PSL-snapshot registered_domain (VERDICT r4 #8): the frozen public-
suffix table drives the eTLD+1 grouping key as a pure column expression,
with an exact pure-Python twin feeding the conformance oracle — and full
crawl conformance holds on a multi-label-suffix (co.uk / com.au) corpus
with politeness keyed on registered_domain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark import corpus as C
from crawlspark.config import CrawlConfig
from crawlspark.engine import CrawlEngine
from crawlspark.functions import psl as P
from crawlspark.functions import urls as U
from crawlspark.oracle import OracleCrawl

# publicsuffix.org's own checkPublicSuffix-style vectors, restricted to
# rules in the frozen snapshot (+ the documented wildcard/exception pair)
VECTORS = [
    ("example.com", "example.com"),
    ("www.example.com", "example.com"),
    ("a.b.example.com", "example.com"),
    ("example.co.uk", "example.co.uk"),
    ("www.example.co.uk", "example.co.uk"),
    ("deep.sub.example.co.uk", "example.co.uk"),
    ("co.uk", "co.uk"),                      # host IS a suffix → fallback
    ("example.com.au", "example.com.au"),
    ("www.shop.com.au", "shop.com.au"),
    ("school.act.edu.au", "school.act.edu.au"),   # 3-label exact rule
    ("www.school.act.edu.au", "school.act.edu.au"),
    ("act.edu.au", "act.edu.au"),            # suffix itself → fallback
    ("district.k12.ca.us", "district.k12.ca.us"),
    ("www.district.k12.ca.us", "district.k12.ca.us"),
    ("example.ck", "example.ck"),            # *.ck: every x.ck is a suffix
    ("b.example.ck", "b.example.ck"),
    ("a.b.example.ck", "b.example.ck"),
    ("www.ck", "www.ck"),                    # !www.ck exception
    ("a.www.ck", "www.ck"),
    ("localhost", "localhost"),
    ("com", "com"),
]


@pytest.mark.parametrize("host,expected", VECTORS)
def test_python_twin_vectors(host, expected):
    assert P.registered_domain_py(host) == expected


def test_expr_equals_python_twin(spark):
    """Property: the column expression and the Python twin agree on a
    generated mix of depths × every suffix class in the snapshot (plus
    unlisted TLDs and the wildcard/exception pair)."""
    suffixes = (
        ["com", "org", "io", "dev", "example", "ck", "www.ck"]
        + sorted(P.SNAPSHOT_RULES.exact2)[::7]
        + sorted(P.SNAPSHOT_RULES.exact3)
    )
    hosts = []
    for s in suffixes:
        hosts += [s, f"reg.{s}", f"www.reg.{s}", f"a.b.reg.{s}"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: r["rd"]
        for r in df.select(
            "host", U.registered_domain(F.col("host"), is_host=True).alias("rd")
        ).collect()
    }
    want = {h: P.registered_domain_py(h) for h in hosts}
    assert got == want


def test_loader_rejects_unsupported_depths():
    with pytest.raises(ValueError):
        P.load_psl_rules(["a.b.c.d"])
    with pytest.raises(ValueError):
        P.load_psl_rules(["*.two.labels"])
    with pytest.raises(ValueError):
        P.load_psl_rules(["!deep.exc.rule"])
    r = P.load_psl_rules(["// c", "", "co.uk", "act.edu.au", "*.ck", "!www.ck", "com"])
    assert r.exact2 == {"co.uk"} and r.exact3 == {"act.edu.au"}
    assert r.wild1 == {"ck"} and r.exc2 == {"www.ck"}


def test_conformance_on_multilabel_suffix_corpus(spark, tmp_path):
    """Full engine-vs-oracle conformance (statuses, per-URL rounds) on a
    corpus whose domains live under co.uk and com.au, politeness keyed on
    registered_domain: hosts s1.d00.co.uk and d00.co.uk must share one
    politeness bucket (d00.co.uk), which only a PSL-aware
    registered_domain produces."""
    d = str(tmp_path / "corpus")
    C.write_corpus(
        d,
        C.CorpusSpec(
            n_pages=30, n_domains=6, seed=11, suffixes=("co.uk", "com.au")
        ),
    )
    cfg = CrawlConfig(
        allowed_url_patterns=(r"https?://[a-z0-9.-]*\.(co\.uk|com\.au)(/|$)",),
    )
    eng = CrawlEngine(spark, cfg, d, str(tmp_path / "state"), checkpoint_interval=50)
    eng.start(resume=False)
    eng.run()
    ora = OracleCrawl(d, cfg)
    ora.run()

    rows = eng.all_rows().select(
        "url", "status", "registered_domain", "completed_round"
    ).collect()
    e_status = {r["url"]: r["status"] for r in rows}
    o_status = {r.url: r.status for r in ora.rows.values()}
    assert e_status == o_status
    e_rounds = {
        r["url"]: r["completed_round"] for r in rows if r["completed_round"]
    }
    o_rounds = {
        r.url: r.completed_round
        for r in ora.rows.values()
        if r.completed_round is not None
    }
    assert e_rounds == o_rounds
    # the buckets really are eTLD+1 (not last-2-labels = co.uk/com.au)
    doms = {r["registered_domain"] for r in rows}
    assert doms and all(d.count(".") == 2 for d in doms), doms
    assert "co.uk" not in doms and "com.au" not in doms
