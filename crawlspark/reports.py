"""Report queries — the conformance oracle surface (SURVEY.md §2.11).

The reference's course deliverables (get_results.ipynb):
  1. unique pages crawled (cell ea7c5d39) — every POPPED url (the
     reference marks all popped URLs complete, worker.py run loop);
  2. longest page (max_words contract, tests/worker_test.py:153-155);
  3. top-50 words excluding stopwords (cells 10cdcc6b-dc36c6de);
  4. subdomain → unique URL count, sorted (cell 2ddf2c32).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlspark.functions import text as X


def unique_pages(all_rows: DataFrame) -> int:
    """Count of popped URLs — everything completed except robots-blocked
    rows (never enqueued → never popped) and still-pending rows."""
    return (
        all_rows.filter(~F.col("status").isin("pending", "robots_blocked"))
        .agg(F.countDistinct("url").alias("n"))
        .collect()[0]["n"]
    )


def subdomain_counts(all_rows: DataFrame) -> DataFrame:
    """hostname → distinct admitted URLs, sorted by hostname (the
    reference's `subdomains` dict includes robots-blocked URLs —
    frontier.py:143-146 adds before the gate)."""
    return (
        all_rows.groupBy(F.col("host").alias("subdomain"))
        .agg(F.countDistinct("url").alias("unique_urls"))
        .orderBy("subdomain")
    )


def longest_page(all_rows: DataFrame) -> tuple[str | None, int]:
    """(url, total_words) of the word-richest page among pages whose words
    were recorded (status 'parsed'); ties → first recorded (lowest seq)."""
    rows = (
        all_rows.filter(F.col("status") == "parsed")
        .orderBy(F.col("total_words").desc(), F.col("discovery_seq").asc())
        .select("url", "total_words")
        .limit(1)
        .collect()
    )
    if not rows:
        return None, 0
    return rows[0]["url"], rows[0]["total_words"]


def top_words(all_rows: DataFrame, pages: DataFrame, k: int = 50) -> DataFrame:
    """Global word histogram over recorded pages (status 'parsed'),
    stopwords excluded; top-k by (count desc, word asc)."""
    parsed = all_rows.filter(F.col("status") == "parsed").select("url_hash")
    toks = (
        pages.join(parsed, pages["page_hash"] == parsed["url_hash"], "left_semi")
        .select(F.explode(X.content_tokens(F.col("caption"))).alias("word"))
    )
    return (
        toks.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(k)
    )


def crawl_report(all_rows: DataFrame, pages: DataFrame) -> dict:
    lp_url, lp_words = longest_page(all_rows)
    return {
        "unique_pages": unique_pages(all_rows),
        "longest_page": [lp_url, lp_words],
        "subdomains": [
            [r["subdomain"], r["unique_urls"]] for r in subdomain_counts(all_rows).collect()
        ],
        "top_words": [[r["word"], r["cnt"]] for r in top_words(all_rows, pages).collect()],
    }
