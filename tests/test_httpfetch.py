"""Live-HTTP fetch operator shape (S2 prod parity) driven offline by an
injected fake transport — mirrors the reference's download() contract
(/root/reference/utils/download.py:7-48): status capture, error Response
rows on exceptions, redirects surfaced (not followed), and the shared
routing verdict downstream."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from crawlspark.config import CrawlConfig
from crawlspark.functions import urls as U
from crawlspark.operators.httpfetch import http_fetch, live_fetch_and_route

CAPTION = " ".join(f"tok{i}" for i in range(40))  # >= min_words distinct

FAKE_WEB = {
    "https://a.example/page": (
        200,
        "text/html; charset=utf-8",
        (
            "<html><header><a href='/chrome'>nav</a></header>"
            "<body><a href='/next'>n</a>"
            "<a href='https://b.example/x'>abs</a>"
            f"<p>{CAPTION}</p></body></html>"
        ).encode(),
        None,
    ),
    "https://a.example/gone": (404, "text/html", b"nope", None),
    "https://a.example/moved": (301, None, b"", "https://a.example/page"),
    "https://a.example/thin": (200, "text/html", b"<p>tiny</p>", None),
    "https://a.example/bin": (200, "application/pdf", b"%PDF", None),
}


def make_transport(web):
    # returned closure is cloudpickled BY VALUE (a module-level function
    # in a test file would be pickled by reference, which Spark workers
    # cannot import)
    def transport(url: str):
        if url not in web:
            raise ConnectionError(f"no route to {url}")
        return web[url]

    return transport


def _scheduled(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return df.select(
        "url",
        U.url_hash64(F.col("url")).alias("url_hash"),
        F.lit(1).alias("depth"),
        F.monotonically_increasing_id().alias("discovery_seq"),
    )


def test_http_fetch_rows_and_errors(spark):
    sched = _scheduled(
        spark, ["https://a.example/page", "https://a.example/nowhere"]
    )
    rows = {
        r["url_hash"]: r
        for r in http_fetch(sched, "crawlspark/0.1", make_transport(FAKE_WEB)).collect()
    }
    by_url = {r["url"]: r["url_hash"] for r in sched.collect()}
    ok = rows[by_url["https://a.example/page"]]
    assert ok["http_status"] == 200
    assert ok["content_type"].startswith("text/html")
    assert ok["content_length"] == len(FAKE_WEB["https://a.example/page"][2])
    assert ok["fetch_error"] is None
    err = rows[by_url["https://a.example/nowhere"]]
    assert err["http_status"] is None
    assert "no route" in err["fetch_error"]


def test_live_fetch_and_route_verdicts(spark):
    urls = list(FAKE_WEB) + ["https://a.example/nowhere"]
    sched = _scheduled(spark, urls)
    cfg = CrawlConfig(min_words=30)
    routed = {
        r["url"]: r
        for r in live_fetch_and_route(sched, cfg, make_transport(FAKE_WEB)).collect()
    }
    assert routed["https://a.example/page"]["route"] == "parse"
    assert routed["https://a.example/gone"]["route"] == "error"
    assert routed["https://a.example/moved"]["route"] == "redirect"
    assert routed["https://a.example/moved"]["redirect_to"] == "https://a.example/page"
    assert routed["https://a.example/thin"]["route"] == "low_data"
    assert routed["https://a.example/bin"]["route"] == "skipped_type"
    assert routed["https://a.example/nowhere"]["route"] == "fetch_error"
    # link extraction: header links dropped, hrefs absolutized
    links = routed["https://a.example/page"]["out_links"]
    assert links == ["https://a.example/next", "https://b.example/x"]
    assert routed["https://a.example/page"]["total_words"] == 40


def test_engine_runs_live_http_mode(spark, tmp_path):
    """Full engine loop over the fake web: corpus-less construction,
    seeds from config, discovery through parsed HTML links, politeness
    rounds — extra['fetch_mode']='http' swaps the fetch stage only."""
    from crawlspark.engine import CrawlEngine

    web = {
        "https://a.example/start": (
            200, "text/html",
            (
                "<html><body><a href='/p2'>x</a>"
                f"<p>{CAPTION}</p></body></html>"
            ).encode(),
            None,
        ),
        "https://a.example/p2": (
            200, "text/html",
            (
                "<html><body><a href='https://a.example/start'>back</a>"
                f"<p>{CAPTION} extra</p></body></html>"
            ).encode(),
            None,
        ),
    }
    cfg = CrawlConfig(
        seed_urls=("https://a.example/start",),
        allowed_url_patterns=(r"https?://[a-z0-9.-]*\.example(/|$)",),
        extra={"fetch_mode": "http", "http_transport": make_transport(web)},
    )
    eng = CrawlEngine(spark, cfg, None, str(tmp_path / "state"), checkpoint_interval=100)
    eng.start(resume=False)
    eng.run(max_rounds=5)
    rows = {r["url"]: r["status"] for r in eng.all_rows().select("url", "status").collect()}
    assert rows == {
        "https://a.example/start": "parsed",
        "https://a.example/p2": "parsed",
    }


def test_requests_transport_gated():
    """The default transport needs `requests`; absent here, the error is
    a clean ImportError at construction (not a worker-side crash)."""
    from crawlspark.operators.httpfetch import requests_transport

    try:
        import requests  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError):
            requests_transport("ua/1.0")
