"""Corpus-level term statistics: tf-idf term ranking.

The reference's word-count surface (missing ``scraper.count_words``,
contract tests/scraper_test.py:21-27; report aggregates in
crawler/frontier.py word_count/max_words) stops at raw counts — top-50
words, longest page. tf-idf is the next training-data-pipeline step on
the same token stream: score terms per document against the corpus
document frequency, the standard relevance/quality signal.

Plan shape: one explode over the tokenizer, ONE aggregation producing
per-(doc, term) tf, a term-level df aggregate joined back (df table is
|vocabulary|-sized — orders of magnitude smaller than the token stream),
and a per-doc window for the top-k cut. Everything is built-in
expressions inside whole-stage codegen; no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawlspark.functions.text import STOPWORD_SETS, md5_int60, tokens

# SHARED persist registry (operators/dedup.py's): intermediates cached
# inside any entry point are released on the NEXT entry-point call of
# ANY operator module — a bench/suite run never accumulates cached
# blocks across queries (guide §5: cached data competes with execution
# memory; unpersist when done)
from crawlspark.operators.dedup import _persist, release_caches  # noqa: F401


def tfidf_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` terms per document by tf-idf.

    score = tf * ln(N / df), rounded to 6 decimals BEFORE ranking so the
    ordering is identical across engines (ulp-level ln() differences
    cannot flip ranks); ties break on the term string. Returns
    (doc_id, term, score, rk).
    """
    from crawlspark.operators.dedup import SPREAD_MIN_SCAN_BYTES, _spread

    release_caches()
    n_docs = docs.select(id_col).distinct().count()
    # _spread: a single-file corpus arrives as ONE scan partition and the
    # regexp tokenize would run serially; persist tf — it feeds both the
    # df aggregate and the scoring join (the tokenize+explode would
    # otherwise run twice)
    tf = _persist(
        _spread(docs.select(id_col, text_col), min_bytes=SPREAD_MIN_SCAN_BYTES)
        .select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(df_tbl, "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "score", F.col("rk").cast("long").alias("rk"))
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing word
    ``n``-gram shingles with a benchmark/eval set (the standard pre-train
    hygiene pass — e.g. GPT-3's 13-gram and Llama's n-gram overlap scans).

    Returns (doc_id, n_shingles, n_hit, hit_frac) for every train doc
    with at least ``min_overlap`` distinct shingles present anywhere in
    the benchmark, ordered by doc_id.

    Scale shape: the benchmark side is bounded by construction (eval
    suites are millions of shingles at most, never corpus-sized), so its
    distinct 60-bit shingle hashes are force-broadcast and the 100 TB
    train side streams past map-side — zero shuffle for the join; the
    only exchange is the per-doc hit count, whose input is already
    filtered to contaminated (doc, shingle) rows. Shingling runs in the
    Arrow ``text_shingles_udf`` batch kernel; the join key is the shared
    ``md5_int60`` hash so the DuckDB twin sees identical collisions.
    """
    from crawlspark.operators.dedup import text_shingles_udf

    sh = text_shingles_udf(n)
    bench_h = (
        bench.select(F.explode(sh(F.col(text_col))).alias("sh"))
        .select(md5_int60(F.col("sh")).alias("h"))
        .distinct()
    )
    ex = train.select(
        F.col(id_col).alias("doc_id"), sh(F.col(text_col)).alias("shs")
    ).select(
        "doc_id",
        F.size("shs").alias("n_shingles"),
        F.explode("shs").alias("sh"),
    ).select("doc_id", "n_shingles", md5_int60(F.col("sh")).alias("h"))
    return (
        ex.join(F.broadcast(bench_h), "h")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count("*").alias("n_hit"))
        .filter(F.col("n_hit") >= min_overlap)
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_shingles"), 6).alias("hit_frac"),
        )
        .orderBy("doc_id")
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition signals: per document the
    token count, distinct-token fraction, most-frequent-word fraction and
    most-frequent-bigram fraction (the classic low-quality/template
    detectors — a doc whose top bigram covers 20% of its text is
    boilerplate, not prose).

    Returns (doc_id, n_tokens, distinct_frac, top_word_frac,
    top_bigram_frac) ordered by doc_id; documents with zero tokens are
    dropped (no signal). All stages are native codegen: one posexplode,
    a lead() window for bigrams (no interpreted array HOF in the hot
    path), and hash aggregations keyed on doc_id — every exchange
    carries per-doc partials, never the raw token stream twice.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(tokens(F.col(text_col)))
    ).toDF("doc_id", "pos", "term")
    word_agg = (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_word"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = toks.select(
        "doc_id",
        F.concat_ws(" ", "term", F.lead("term").over(w)).alias("bigram"),
        F.lead("term").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    bigram_agg = (
        bigrams.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram"))
    )
    return (
        word_agg.join(bigram_agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias(
                "distinct_frac"
            ),
            F.round(F.col("top_word") / F.col("n_tokens"), 6).alias(
                "top_word_frac"
            ),
            F.round(
                F.coalesce(F.col("top_bigram"), F.lit(0))
                / F.greatest(F.col("n_tokens") - 1, F.lit(1)),
                6,
            ).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


def scrub_stopwords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: str = "default",
) -> DataFrame:
    """Corpus transformation: re-emit each document with stopwords
    removed and whitespace normalized (the cleaning pass a training
    pipeline writes back out, not just a statistic).

    Returns (doc_id, clean_text, n_removed) ordered by doc_id. Pure
    per-row column expressions — no shuffle at all except the final
    presentation sort; at 100 TB this is a map-only rewrite of the
    corpus."""
    sw = F.array(*[F.lit(w) for w in STOPWORD_SETS[stopwords]])
    toks = tokens(F.col(text_col))
    kept = F.filter(toks, lambda t: ~F.array_contains(sw, t))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_join(kept, " ").alias("clean_text"),
        (F.size(toks) - F.size(kept)).cast("long").alias("n_removed"),
    ).orderBy("doc_id")


def source_dup_stats(
    docs: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-source duplication + size rollup: the crawl-policy signal
    ("which feeds are mostly mirrors?") that decides where a large crawl
    spends its budget. Returns (source, n_docs, n_unique, dup_frac,
    avg_chars) ordered by source. One aggregation on the group key with a
    single count-distinct over the 128-bit text hash (never the text
    itself) — the distinct's expand shuffles hashes, not documents."""
    return (
        docs.groupBy(F.col(group_col).alias("source"))
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(F.md5(F.col(text_col))).alias("n_unique"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            F.round(1.0 - F.col("n_unique") / F.col("n_docs"), 6).alias(
                "dup_frac"
            ),
            "avg_chars",
        )
        .orderBy("source")
    )


# Frozen PII patterns — deliberately conservative, expressible
# identically in Java regex (Spark) and RE2 (DuckDB): no lookaround, no
# backreferences, no inline flags. Applied to the raw text in this
# order; each match is replaced by its tag.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9]{1,3}[ -][0-9]{2,4}[ -][0-9]{3,4}[ -][0-9]{3,4}\b", "<PHONE>"),
]


def pii_scrub(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """PII redaction — the C4/Dolma-style scrub pass a training corpus
    gets before export: emails, IPv4 addresses and international phone
    numbers replaced by typed tags, with per-kind match counts so the
    pipeline can audit redaction rates per source.

    Returns (doc_id, scrubbed_text, n_email, n_ipv4, n_phone). Pure
    per-row regexp expressions — map-only at 100 TB, no shuffle, and
    the scan prunes to (id, text). Counts are computed BEFORE the
    rewrite on the original text; replacement applies the frozen
    patterns in declaration order."""
    text = F.col(text_col)
    counts = []
    for name, pat, _tag in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
    scrubbed = text
    for _name, pat, tag in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, tag)
    return docs.select(
        F.col(id_col),
        scrubbed.alias("scrubbed_text"),
        *counts,
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking — the context-window prep stage
    for training and retrieval corpora: each document becomes
    fixed-size ``chunk_tokens`` windows starting every
    ``chunk_tokens - overlap`` tokens, so consecutive chunks share
    ``overlap`` tokens of context and the tail is always covered.

    Deterministic spec (full DuckDB twin): a document with n > 0 tokens
    yields K = max(1, ceil((n - chunk_tokens)/stride) + 1) chunks at
    starts 0, stride, 2*stride, …; the final chunk may be shorter than
    ``chunk_tokens`` but is never empty. n = 0 yields no rows.

    Plan: one JVM-side transform over a generated start sequence +
    posexplode — no UDF, no shuffle; the exploded frame is
    ~n/stride rows per doc with each token copied ~chunk/stride times
    (the overlap factor, a deliberate storage/context trade the caller
    sets).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    from crawlspark.operators.dedup import SPREAD_MIN_SCAN_BYTES, _spread

    # _spread: single-file corpora otherwise tokenize+explode on one core
    df = _spread(df.select(id_col, text_col), min_bytes=SPREAD_MIN_SCAN_BYTES)
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks"), F.size(toks).alias("n")
    ).filter(F.col("n") > 0)
    k = F.greatest(
        F.lit(1),
        (F.ceil((F.col("n") - chunk_tokens) / F.lit(float(stride))) + 1).cast(
            "int"
        ),
    )
    starts = F.transform(F.sequence(F.lit(0), k - 1), lambda i: i * stride)
    return (
        base.select(
            "doc_id", "n", "toks",
            F.posexplode(starts).alias("chunk_pos", "start"),
        )
        .select(
            "doc_id",
            "chunk_pos",
            "start",
            F.least(F.lit(chunk_tokens), F.col("n") - F.col("start")).alias(
                "n_chunk_tokens"
            ),
            F.concat_ws(
                " ", F.slice(F.col("toks"), F.col("start") + 1, chunk_tokens)
            ).alias("chunk_text"),
        )
    )
