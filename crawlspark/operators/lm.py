"""Corpus-trained bigram language-model scoring (perplexity quality
signal).

The standard pipeline quality gate beyond surface heuristics
(functions/text.quality_score): train an add-one-smoothed bigram LM on
the corpus itself, score every document by cross-entropy / perplexity,
and let downstream sampling drop the high-perplexity tail (the
CCNet/KenLM-style filter, with the LM trained in-plan instead of
imported — no external model, fully deterministic).

Frozen spec (so the DuckDB twin is exact):
- tokens = the repo's frozen lowercase-alnum tokenizer;
- bigram key = ``a || ' ' || b`` over adjacent token pairs;
- context count C(a) = Σ_b C(a,b) (derived from the bigram table — no
  second corpus pass); V = distinct unigram count over all positions;
- P(b|a) = (C(a,b) + 1) / (C(a) + V)  (add-one smoothing);
- per doc: cross_entropy = round(-mean ln P, 6), perplexity =
  round(exp(cross_entropy), 6) — the entropy is rounded BEFORE the exp
  so both engines exponentiate the same number (the same
  round-before-derive discipline as tfidf/pagerank twins). Docs with
  fewer than two tokens have no bigrams and are omitted.

Scale story: one explode over adjacent pairs (corpus-sized, narrow),
two hash aggregates for the model (bigram-vocabulary-sized output),
and one big-big hash equi-join on the 1-column bigram key to score —
partial aggregation runs map-side everywhere; the model tables are
vocabulary-sized, never corpus-sized. The scalar V rides in as a
literal-free cross join of a 1-row aggregate (Catalyst broadcasts it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlspark.functions.text import tokens

# SHARED persist registry (operators/dedup.py's): intermediates cached
# inside any entry point are released on the NEXT entry-point call of
# ANY operator module — a bench/suite run never accumulates cached
# blocks across queries (guide §5: cached data competes with execution
# memory; unpersist when done)
from crawlspark.operators.dedup import _persist, release_caches  # noqa: F401


def _doc_bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = tokens(F.col(text_col))
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return docs.select(F.col(id_col), F.explode(pairs).alias("bg"))


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train the corpus bigram LM and score every document; returns
    (id, n_bigrams, cross_entropy, perplexity)."""
    from crawlspark.operators.dedup import SPREAD_MIN_SCAN_BYTES, _spread

    release_caches()
    # _spread: a single-file corpus arrives as ONE scan partition and the
    # regexp tokenize would run serially (dedup.py's small-file guard);
    # persist the bigram explode: it feeds BOTH the model aggregate and
    # the scoring join — without the cache the corpus tokenizes and
    # explodes twice (the regexp tokenize is the dominant per-row work)
    docs = _spread(docs.select(id_col, text_col), min_bytes=SPREAD_MIN_SCAN_BYTES)
    bg = _persist(_doc_bigrams(docs, text_col, id_col))
    cab = bg.groupBy("bg").agg(F.count("*").alias("cab"))
    ca = (
        cab.groupBy(F.substring_index(F.col("bg"), " ", 1).alias("a"))
        .agg(F.sum("cab").alias("ca"))
    )
    v = docs.select(
        F.explode(tokens(F.col(text_col))).alias("w")
    ).agg(F.countDistinct("w").alias("v"))
    model = cab.join(
        ca, F.substring_index(F.col("bg"), " ", 1) == F.col("a")
    ).crossJoin(F.broadcast(v)).select(
        "bg",
        (F.log(F.col("cab") + 1) - F.log(F.col("ca") + F.col("v"))).alias("lnp"),
    )
    return (
        bg.join(model, "bg")
        .groupBy(F.col(id_col))
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(-F.avg("lnp"), 6).alias("cross_entropy"),
        )
        .withColumn("perplexity", F.round(F.exp(F.col("cross_entropy")), 6))
    )
