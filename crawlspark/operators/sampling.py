"""Corpus-preparation operators: stratified sampling and token-budget
packing — the selection/batching stages a training-data pipeline runs
after dedup (no reference analog; SURVEY.md §2's pipeline surface).

Both are pure column/window programs (zero UDFs, whole-stage codegen)
with exact DuckDB twins:

- ``sample_stratified``: per-stratum Bernoulli keep-decision from the
  shared deterministic 60-bit md5 hash — the same rows survive on any
  engine, any partitioning, any run. One projection + filter; no
  shuffle at all (the rates dict rides along as a literal CASE).
- ``pack_token_budget``: contiguous token packing — docs ordered by id
  within a stratum, bin = floor(running-token-start / budget). This is
  the concat-then-chunk batching LLM pipelines use (a bin may overrun
  by less than one document). One window cumsum per stratum: a single
  hash-partitioned shuffle on the stratum key; skewed strata split
  fine under AQE because the window is partitioned, not global.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crawlspark.functions.text import md5_int60, token_count

# Bernoulli draw resolution: u = (hash(id) % 1e6) / 1e6 — matches the
# DuckDB twin exactly in integer space before the single division
SAMPLE_MOD = 1_000_000


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row iff hash-uniform(id) < rate(stratum). Deterministic
    (no Spark `rand()`: same sample under resume/retry/repartition) and
    exactly reproducible by any engine with md5."""
    u = md5_int60(F.col(id_col).cast("string")) % SAMPLE_MOD
    rate: Column = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(rate)
    # round(), not a truncating cast: DuckDB's bigint cast ROUNDS, so a
    # non-dyadic rate like 0.7 (0.7e6 = 699999.999…) would otherwise put
    # the two engines one hash-bucket apart; both twins now round
    return df.filter(u < F.round(rate * SAMPLE_MOD).cast("long"))


def pack_token_budget(
    docs: DataFrame,
    budget: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each doc to a training-batch bin: docs are laid out in
    ``id_col`` order within each stratum and chunked every ``budget``
    tokens (bin boundaries fall where the RUNNING START crosses a
    multiple of the budget — the concat-then-chunk rule). Returns
    (doc_id, <strata_col>, n_tokens, bin)."""
    w = (
        Window.partitionBy(strata_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = token_count(F.col(text_col)).cast("long")
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(strata_col),
            toks.alias("n_tokens"),
        )
        .withColumn(
            "bin",
            F.floor(
                (F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(budget)
            ).cast("long"),
        )
    )
