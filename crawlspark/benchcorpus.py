"""Scale-shaped synthetic frontier + corpus, generated IN SPARK.

The test corpus (crawlspark.corpus) is driver-side Python — exact, small,
oracle-friendly. For throughput benchmarks we need 10^5-10^7 rows shaped
like the 10^10 target (Zipfian registered domains → one hot domain,
link fan-out, status mix), generated distributed: ``spark.range`` +
column expressions only, no Python loop, no driver materialization.

Determinism: every random choice derives from ``xxhash64(id, salt)`` —
same rows at any parallelism level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from crawlspark.functions import urls as U

VOCAB_SIZE = 400
ZIPF_EXP = 2.5  # dom = floor(D * u^ZIPF_EXP) → heavy head


def _u01(id_col: Column, salt: int) -> Column:
    """Deterministic uniform [0,1) from the row id."""
    return (F.pmod(F.xxhash64(id_col, F.lit(salt)), F.lit(1_000_003)) / 1_000_003.0)


def _dom(id_col: Column, n_domains: int) -> Column:
    return F.floor(F.lit(n_domains) * F.pow(_u01(id_col, 1), F.lit(ZIPF_EXP))).cast("int")


def _host(id_col: Column, n_domains: int) -> Column:
    dom = _dom(id_col, n_domains)
    sub = F.pmod(F.xxhash64(id_col, F.lit(2)), F.lit(4))
    base = F.concat(F.lit("d"), F.format_string("%04d", dom), F.lit(".example"))
    return F.when(sub == 0, base).otherwise(
        F.concat(F.lit("s"), sub.cast("string"), F.lit("."), base)
    )


def _url(id_col: Column, n_domains: int) -> Column:
    return F.concat(
        F.lit("https://"), _host(id_col, n_domains),
        F.lit("/wiki/p"), F.format_string("%08d", id_col),
    )


def _caption(id_col: Column, n_words: int = 40) -> Column:
    words = F.transform(
        F.sequence(F.lit(1), F.lit(n_words)),
        lambda i: F.concat(
            F.lit("w"),
            F.format_string(
                "%03d", F.pmod(F.xxhash64(id_col, i, F.lit(3)), F.lit(VOCAB_SIZE))
            ),
        ),
    )
    return F.concat_ws(" ", words)


def build_pages(
    spark: SparkSession, n_pages: int, n_domains: int, fanout: int = 6,
    partitions: int | None = None,
) -> DataFrame:
    """pages table (fetch-join shape; no image payload at bench scale —
    payload validation is exercised at test scale, SURVEY.md §5.3)."""
    if partitions is None:
        # match the session's core count: the per-round fetch join scans
        # this cached frame every politeness tick, and a partition count
        # above the core count turns each tiny scan into multiple task
        # waves of pure scheduling latency
        partitions = spark.sparkContext.defaultParallelism
    ids = spark.range(0, n_pages, 1, partitions).withColumnRenamed("id", "pid")
    pid = F.col("pid")
    n_links = F.pmod(F.xxhash64(pid, F.lit(4)), F.lit(fanout + 1))
    links = F.transform(
        F.sequence(F.lit(1), n_links),
        lambda j: _url(
            F.pmod(pid * 2654435761 + j.cast("long") * 40503 + 17, F.lit(n_pages)),
            n_domains,
        ),
    )
    caption = _caption(pid)
    return ids.select(
        _url(pid, n_domains).alias("canonical_url"),
        F.when(pid % 97 == 1, 301)
        .when(pid % 89 == 2, 404)
        .when(pid % 83 == 3, 500)
        .otherwise(200)
        .cast("int")
        .alias("status"),
        F.when(pid % 97 == 1, _url(F.pmod(pid + 7, F.lit(n_pages)), n_domains))
        .otherwise(F.lit(None))
        .alias("redirect_to"),
        F.when(pid % 103 == 6, "application/pdf").otherwise("text/html").alias("content_type"),
        F.when(pid % 79 == 4, F.lit(0))
        .when(pid % 101 == 5, F.lit(20_000_000))
        .otherwise(F.length(caption) + 1000)
        .cast("long")
        .alias("content_length"),
        caption.alias("caption"),
        links.alias("out_links"),
    )


def build_frontier(
    spark: SparkSession, n_pages: int, n_domains: int,
    partitions: int | None = None,
) -> DataFrame:
    """Pre-filled pending frontier (the '10^10-URL frontier' stand-in):
    every page pending at depth 0, discovery_seq = id."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    ids = spark.range(0, n_pages, 1, partitions).withColumnRenamed("id", "pid")
    pid = F.col("pid")
    url = _url(pid, n_domains)
    host = _host(pid, n_domains)
    return ids.select(
        url.alias("url"),
        U.url_hash64(url).alias("url_hash"),
        F.lit(None).cast("string").alias("url_sha"),  # off at bench scale
        host.alias("host"),
        U.registered_domain(host, is_host=True).alias("registered_domain"),
        U.path(url).alias("path"),
        F.lit(0).alias("depth"),
        F.lit("bulk").alias("src"),
        pid.cast("long").alias("discovery_seq"),
        F.lit(0).alias("discovered_round"),
        F.lit("pending").alias("status"),
    )


def build_robots(spark: SparkSession, n_domains: int) -> DataFrame:
    doms = spark.range(0, n_domains).select(
        F.concat(F.lit("d"), F.format_string("%04d", F.col("id")), F.lit(".example")).alias(
            "registered_domain"
        )
    )
    return doms.select(
        "registered_domain",
        F.lit(
            "User-agent: *\nDisallow: /private/\nDisallow: /admin/\nAllow: /admin/public/\n"
        ).alias("body"),
    )
