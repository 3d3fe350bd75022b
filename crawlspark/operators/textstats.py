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

from crawlspark.functions.text import tokens


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
    n_docs = docs.select(id_col).distinct().count()
    tf = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term"))
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
        .select("doc_id", "term", "score", "rk")
    )
