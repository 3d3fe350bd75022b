"""URL column functions vs Python urllib ground truth.

Pins the reference semantics: normalize (utils/__init__.py:52-64),
defragment (frontier.py:125-127), sha256 seen-key (utils/__init__.py:35-50).
"""

from __future__ import annotations

from hashlib import sha256
from urllib.parse import urljoin, urlparse

from pyspark.sql import functions as F

from crawlspark.functions import urls as U

CASES = [
    "https://poewiki.net/wiki/Page",
    "https://poewiki.net/wiki/Page/",
    "https://poewiki.net/wiki/Page///",
    "https://poewiki.net/wiki/Page#frag",
    "http://user@host.co.uk:8080/a/b;param=1?x=1&y=2#z",
    "https://sub.domain.example.com/a%20b/c?q=hello+world",
    "https://a.com",
    "https://a.com/;p",
    "https://a.com/x;y;z/w",
    "https://a.com/x/y;last?q=1",
    "HTTPS://A.com/Path",
]


def ref_urlhash(url: str) -> str:
    parsed = urlparse(url)
    return sha256(
        f"{parsed.netloc}/{parsed.path}/{parsed.params}/"
        f"{parsed.query}".encode("utf-8")
    ).hexdigest()


def _run(spark, col_fn, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [r[0] for r in df.select(col_fn(F.col("url"))).collect()]


def test_normalize_matches_rstrip(spark):
    got = _run(spark, U.normalize, CASES)
    want = [u.rstrip("/") if u.endswith("/") else u for u in CASES]
    assert got == want


def test_defragment(spark):
    got = _run(spark, U.defragment, CASES)
    want = [urlparse(u)._replace(fragment="").geturl() if "#" in u else u for u in CASES]
    # geturl may normalize differently; compare against simple split
    want = [u.split("#", 1)[0] for u in CASES]
    assert got == want


def test_components_match_urlparse(spark):
    for fn, attr in [
        (U.netloc, "netloc"),
        (U.path, "path"),
        (U.params, "params"),
        (U.query, "query"),
    ]:
        got = _run(spark, fn, CASES)
        want = [getattr(urlparse(u), attr) for u in CASES]
        assert got == want, f"{attr}: {list(zip(CASES, got, want))}"


def test_hostname_matches_urlparse(spark):
    got = _run(spark, U.hostname, CASES)
    want = [(urlparse(u).hostname or "") for u in CASES]
    assert got == want


def test_sha256_key_matches_reference(spark):
    got = _run(spark, U.url_sha256, CASES)
    want = [ref_urlhash(u) for u in CASES]
    assert got == want


def test_scheme_collapse(spark):
    """http/https hash to the same key — scheme excluded (ref
    utils/__init__.py:46-50)."""
    a, b = _run(spark, U.url_sha256, ["http://a.com/x", "https://a.com/x"])
    assert a == b


def test_registered_domain(spark):
    cases = {
        "https://www.cs.uci.edu/a": "uci.edu",
        "https://deep.sub.host.co.uk/": "host.co.uk",
        "https://example.com/x": "example.com",
        "https://localhost/x": "localhost",
    }
    got = _run(spark, U.registered_domain, list(cases))
    assert got == list(cases.values())


def test_resolve_href_common_cases(spark):
    base = "https://a.com/dir/page.html?q=1#f"
    hrefs = [
        "https://b.com/abs",
        "//cdn.com/x",
        "/root/y",
        "rel/z",
        "?q=2",
        "#sec",
        "file.html",
    ]
    df = spark.createDataFrame([(base, h) for h in hrefs], ["base", "href"])
    got = [
        r[0]
        for r in df.select(U.resolve_href(F.col("base"), F.col("href"))).collect()
    ]
    want = [urljoin(base, h) for h in hrefs]
    assert got == want, list(zip(hrefs, got, want))
