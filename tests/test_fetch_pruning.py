"""Bucketed-pages fetch join (extra['bucket_pages']): the corpus is laid
out hash-bucketed by page_hash and each round's fetch join scans only
the buckets the scheduled keys touch — results must be identical to the
default full-scan join."""

from __future__ import annotations

import os

import pytest

from crawlspark import corpus as C
from crawlspark.config import CrawlConfig
from crawlspark.engine import CrawlEngine
from crawlspark.reports import crawl_report


@pytest.mark.slow
def test_bucketed_fetch_matches_default(spark, tmp_path):
    d = str(tmp_path / "corpus")
    C.write_corpus(d, C.CorpusSpec(n_pages=60, n_domains=8, seed=7))

    a = CrawlEngine(
        spark,
        CrawlConfig(allowed_url_patterns=C.ALLOWED_PATTERNS),
        d, str(tmp_path / "sa"), checkpoint_interval=100,
    )
    a.start(resume=False)
    a.run(max_rounds=6)

    b = CrawlEngine(
        spark,
        CrawlConfig(
            allowed_url_patterns=C.ALLOWED_PATTERNS,
            frontier_buckets=16,
            extra={"bucket_pages": True},
        ),
        d, str(tmp_path / "sb"), checkpoint_interval=100,
    )
    b.start(resume=False)
    b.run(max_rounds=6)

    assert b.pages_bucketed and "pbucket" in b.pages.columns
    # partitioned layout on disk
    bdir = os.path.join(str(tmp_path / "sb"), "pages_bucketed")
    assert any(x.startswith("pbucket=") for x in os.listdir(bdir))

    ea = {r["url"]: r["status"] for r in a.all_rows().select("url", "status").collect()}
    eb = {r["url"]: r["status"] for r in b.all_rows().select("url", "status").collect()}
    assert ea == eb
    ra = crawl_report(a.all_rows(), a.pages)
    rb = crawl_report(b.all_rows(), b.pages)
    assert ra == rb
