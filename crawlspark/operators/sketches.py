"""Count-min sketch over token streams — the fixed-memory frequency
sketch a 100 TB corpus needs for heavy-hitter queries (exact per-token
counts are an O(vocabulary) shuffle; the sketch is d×w cells regardless
of corpus size, map-side partial-aggregated, and mergeable across
partitions/batches by cell-wise addition).

Everything is derived from the shared deterministic 60-bit md5 hash
(``h_i(t) = md5_int60("{i}#" + t) % w``), so the sketch — and therefore
every estimate — is bit-identical on any engine with md5: unlike
HLL/KLL (estimator-specific), the CMS carries a FULL value-hash DuckDB
twin. Estimates only ever overestimate (cms_n >= exact_n), the standard
CMS guarantee; the driver query emits the exact count beside the
estimate so the error is visible and gateable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlspark.functions.text import md5_int60, tokens

CMS_DEPTH = 4     # d pairwise-independent-ish hash rows
CMS_WIDTH = 256   # w buckets per row — error ~ 2N/w with prob 1-2^-d


def _bucket(col, i: int, width: int):
    return md5_int60(F.concat(F.lit(f"{i}#"), col)) % width


def _token_stream(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(F.explode(tokens(F.col(text_col))).alias("t"))


def cms_sketch(
    df: DataFrame, text_col: str = "text",
    depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
) -> DataFrame:
    """(i, b, cell_n): the d×w cell counts over ALL token occurrences.
    One explode + one hash aggregate; the result is a constant-size
    frame whatever the corpus."""
    tok = _token_stream(df, text_col)
    cells = tok.select(
        F.posexplode(
            F.array(*[_bucket(F.col("t"), i, width) for i in range(depth)])
        ).alias("i", "b")
    )
    return cells.groupBy("i", "b").agg(F.count("*").alias("cell_n"))


def cms_heavy_hitters(
    df: DataFrame, text_col: str = "text", k: int = 20,
    depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
) -> DataFrame:
    """The true top-``k`` tokens (by exact count, ties by token) with
    their CMS estimates beside the exact counts:
    (word, exact_n, cms_n), cms_n = min over the d cells the word hashes
    to — always >= exact_n. Deterministic end to end."""
    tok = _token_stream(df, text_col)
    exact = tok.groupBy("t").agg(F.count("*").alias("exact_n"))
    top = exact.orderBy(F.col("exact_n").desc(), F.col("t")).limit(k)
    sketch = cms_sketch(df, text_col, depth, width)
    probes = top.select(
        "t",
        "exact_n",
        F.posexplode(
            F.array(*[_bucket(F.col("t"), i, width) for i in range(depth)])
        ).alias("i", "b"),
    )
    return (
        probes.join(sketch, ["i", "b"])
        .groupBy("t", "exact_n")
        .agg(F.min("cell_n").alias("cms_n"))
        .select(F.col("t").alias("word"), "exact_n", "cms_n")
    )
