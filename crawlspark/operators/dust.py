"""DUST rule mining — "Different URLs, Similar Text" (Bar-Yossef,
Keidar & Schonfeld, WWW'07; the session-id/tracking-param problem every
crawler hits).

Finds query parameters that provably do NOT affect page content on a
host, so the frontier can canonicalize them away BEFORE fetching —
at web scale, un-mined session parameters multiply the frontier by the
number of sessions. The reference crawler only suppresses such URLs
after the fact via URL-Jaccard against already-bad URLs
(crawler/worker.py:149-194, operators/badurls.py here); rule mining
turns that reactive defense into a proactive rewrite rule.

Evidence model (per host h, parameter k): group fetched pages by the
URL with k stripped (path + the other query pairs, sorted). Within a
group, all that differs is k's value:
- SUPPORT group: exactly one content fingerprint but ≥2 distinct values
  of k → changing k provably did not change content;
- CONFLICT group: ≥2 distinct fingerprints → changing only k DID change
  content (k is load-bearing).
A rule (h, k) is emitted when support ≥ ``min_support`` and conflicts
= 0 — strict by design: one conflicting group vetoes the parameter.

Scale story: NO joins. One explode (≤ #params per URL, a small
constant) and two hash aggregates — both map-side partial, keyed by
(host, param[, rest]); the hot-host skew key is (host, k, rest), which
AQE splits like any agg key. The "exists fingerprint with ≥2 values"
test inside the first agg is the pigeonhole identity
``countDistinct(fp, v) > countDistinct(fp)`` — no per-group sort or
collect_set materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlspark.functions import urls as U


def dust_rules(
    pages: DataFrame,
    url_col: str = "url",
    fp_col: str = "fp",
    min_support: int = 2,
) -> DataFrame:
    """Mine content-irrelevant query parameters. ``pages`` carries one
    row per fetched URL with a content fingerprint column (``fp_col`` —
    md5(text), simhash, any equality-comparable digest). Returns
    (host, param, support) — support = number of clean evidence groups.
    """
    url = F.col(url_col)
    key_of = lambda kv: F.substring_index(kv, "=", 1)  # noqa: E731
    base = pages.select(
        U.hostname(url).alias("host"),
        U.path(url).alias("path"),
        F.filter(F.split(U.query(url), "&"), lambda kv: kv != "").alias("kvs"),
        F.col(fp_col).alias("fp"),
    )
    ex = base.select(
        "host",
        "path",
        "kvs",
        "fp",
        F.explode(F.array_distinct(F.transform(F.col("kvs"), key_of))).alias("k"),
    )
    rest = F.concat_ws(
        "&",
        F.array_sort(
            F.filter(F.col("kvs"), lambda kv: key_of(kv) != F.col("k"))
        ),
    )
    v = F.concat_ws(
        ",",
        F.array_sort(
            F.transform(
                F.filter(F.col("kvs"), lambda kv: key_of(kv) == F.col("k")),
                lambda kv: F.substring_index(kv, "=", -1),
            )
        ),
    )
    g = ex.select(
        "host",
        "k",
        F.concat(F.col("path"), F.lit("?"), rest).alias("rest"),
        "fp",
        v.alias("v"),
    )
    grp = g.groupBy("host", "k", "rest").agg(
        F.countDistinct("fp").alias("n_fp"),
        F.countDistinct("v").alias("n_v"),
    )
    return (
        grp.groupBy("host", F.col("k").alias("param"))
        .agg(
            F.sum(
                F.when((F.col("n_fp") == 1) & (F.col("n_v") >= 2), 1).otherwise(0)
            ).alias("support"),
            F.sum(F.when(F.col("n_fp") >= 2, 1).otherwise(0)).alias("conflicts"),
        )
        .filter((F.col("support") >= min_support) & (F.col("conflicts") == 0))
        .select("host", "param", "support")
    )


def apply_dust_rules(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Rewrite URLs by stripping the mined content-irrelevant params —
    the canonicalize-before-fetch step the rules exist for. ``rules`` is
    dust_rules output (host, param[, support]). Returns the input plus
    ``rewritten_url`` (scheme://host/path?remaining-params, original
    param order preserved; '?' dropped when nothing remains).

    Scale: rules are per-(host, param) — a few rows per host, collapsed
    to host → param-array and broadcast into the page scan (rule tables
    are KB-to-MB at web scale, never data-sized). The rewrite itself is
    pure string/array expressions — codegen'd, shuffle-free."""
    url = F.col(url_col)
    key_of = lambda kv: F.substring_index(kv, "=", 1)  # noqa: E731
    ragg = F.broadcast(
        rules.groupBy("host").agg(
            F.array_sort(F.collect_set("param")).alias("_strip")
        )
    )
    kvs = F.filter(F.split(U.query(url), "&"), lambda kv: kv != "")
    kept = F.filter(
        kvs, lambda kv: ~F.array_contains(F.col("_strip"), key_of(kv))
    )
    rest = F.concat_ws("&", kept)
    rewritten = F.concat(
        U.scheme(url),
        F.lit("://"),
        U.hostname(url),
        U.path(url),
        F.when(rest != "", F.concat(F.lit("?"), rest)).otherwise(F.lit("")),
    )
    return (
        pages.withColumn("host", U.hostname(url))
        .join(ragg, "host", "left")
        .withColumn(
            "rewritten_url",
            F.when(F.col("_strip").isNotNull(), rewritten).otherwise(url),
        )
        .drop("_strip")
    )
