"""DUST rule mining: support groups (one fingerprint, many values),
conflict veto (one group where the param changed content kills the
rule), per-host scoping, and min_support."""

from __future__ import annotations

from crawlspark.operators import dust as DU


def _rules(spark, rows, min_support=2):
    df = spark.createDataFrame(rows, ["url", "fp"])
    return {
        (r["host"], r["param"]): r["support"]
        for r in DU.dust_rules(df, "url", "fp", min_support).collect()
    }


def test_session_param_mined_mode_vetoed(spark):
    rows = [
        # sess never changes content (two clean groups on a.com)
        ("http://a.com/p?id=1&sess=x", "F1"),
        ("http://a.com/p?id=1&sess=y", "F1"),
        ("http://a.com/p?id=2&sess=x", "F2"),
        ("http://a.com/p?id=2&sess=z", "F2"),
        # mode=1 vs mode=2 changes content -> conflict vetoes 'mode'
        ("http://a.com/p?id=1&mode=1", "F1"),
        ("http://a.com/p?id=1&mode=2", "F9"),
    ]
    out = _rules(spark, rows)
    assert out == {("a.com", "sess"): 2}
    # id: within (sess=x) rest-group, id=1 vs id=2 changed fp -> vetoed
    assert ("a.com", "id") not in out


def test_rules_are_per_host_and_min_support(spark):
    rows = [
        ("http://a.com/p?id=1&s=x", "F1"),
        ("http://a.com/p?id=1&s=y", "F1"),
        ("http://a.com/p?id=2&s=x", "F2"),
        ("http://a.com/p?id=2&s=y", "F2"),
        # same param on b.com has only ONE clean group -> below support 2
        ("http://b.com/p?id=1&s=x", "G1"),
        ("http://b.com/p?id=1&s=y", "G1"),
    ]
    out = _rules(spark, rows, min_support=2)
    assert out == {("a.com", "s"): 2}
    # lowering the bar admits b.com
    out1 = _rules(spark, rows, min_support=1)
    assert out1 == {("a.com", "s"): 2, ("b.com", "s"): 1}


def test_apply_rules_rewrites_only_ruled_hosts(spark):
    pages = spark.createDataFrame(
        [
            ("http://a.com/p?sess=x&id=1", "F1"),
            ("http://a.com/p?id=1&sess=y", "F1"),
            ("http://b.com/p?sess=x&id=1", "G1"),   # no rule on b.com
            ("http://a.com/plain", "F2"),           # no query at all
        ],
        ["url", "fp"],
    )
    rules = spark.createDataFrame([("a.com", "sess", 2)], ["host", "param", "support"])
    out = {
        r["url"]: r["rewritten_url"]
        for r in DU.apply_dust_rules(pages, rules, "url").collect()
    }
    # both param orders collapse to ONE canonical URL; '?' dropped when
    # nothing else remains would also hold (id survives here)
    assert out["http://a.com/p?sess=x&id=1"] == "http://a.com/p?id=1"
    assert out["http://a.com/p?id=1&sess=y"] == "http://a.com/p?id=1"
    # un-ruled host and query-less URL pass through untouched
    assert out["http://b.com/p?sess=x&id=1"] == "http://b.com/p?sess=x&id=1"
    assert out["http://a.com/plain"] == "http://a.com/plain"

    # end-to-end: mined rules shrink the frontier
    mined = DU.dust_rules(
        spark.createDataFrame(
            [
                ("http://c.com/p?id=1&s=x", "F1"),
                ("http://c.com/p?id=1&s=y", "F1"),
                ("http://c.com/p?id=2&s=x", "F2"),
                ("http://c.com/p?id=2&s=y", "F2"),
            ],
            ["url", "fp"],
        ),
        "url",
        "fp",
        2,
    )
    rw = DU.apply_dust_rules(
        spark.createDataFrame(
            [("http://c.com/p?id=%d&s=%d" % (i % 2, i), "F") for i in range(8)],
            ["url", "fp"],
        ),
        mined,
        "url",
    )
    assert rw.select("rewritten_url").distinct().count() == 2  # id=0 / id=1


def test_repeated_param_values_canonicalized(spark):
    # k appears twice: value signature is the sorted joined list, so
    # (t=1&t=2) == (t=2&t=1) is ONE value, not support evidence
    rows = [
        ("http://c.com/p?t=1&t=2&u=0", "F1"),
        ("http://c.com/p?t=2&t=1&u=0", "F1"),
    ]
    out = _rules(spark, rows, min_support=1)
    assert ("c.com", "t") not in out
