"""SimHash fingerprinting + LSH-banded near-duplicate joins.

Reference: /root/reference/crawler/simhash.py (64-bit simhash over a word
Counter; similarity = fraction of equal bits, threshold 0.95 at
crawler/worker.py:36 ⇔ Hamming distance ≤ 3).

Deviation (documented, SURVEY.md §2.8): the reference hashes tokens with
builtin ``hash()`` (simhash.py:21) which is salted per process
(PYTHONHASHSEED) — non-reproducible. The engine uses the first 8 bytes of
md5(token) as a big-endian uint64: deterministic across processes, engines
and runs.

Fingerprint computation is an Arrow pandas UDF (numpy bit matrix per
batch); candidate search is an LSH band join in pure DataFrame ops:
4 bands × 16 bits, explode band keys, equi-join on (band, value), verify
``bit_count(a ^ b) <= 3``. A pair within Hamming 3 differs in at most 3
bands, so at least one of 4 bands matches exactly → recall = 1.0.
"""

from __future__ import annotations

from hashlib import md5

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

N_BANDS = 4
BAND_BITS = 16


def token_hash64(token: str) -> int:
    """Deterministic uint64 token hash (md5 head), as python int."""
    return int.from_bytes(md5(token.encode("utf-8")).digest()[:8], "big")


def simhash_counter(counts: dict[str, int]) -> int:
    """Pure-Python twin (conformance oracle). Weighted-bit simhash:
    bit i of the fingerprint is 1 iff Σ±count over tokens (by bit i of the
    token hash) is > 0. Returns signed int64."""
    if not counts:
        return 0
    hs = np.array([token_hash64(t) for t in counts], dtype=np.uint64)
    ws = np.array(list(counts.values()), dtype=np.int64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    acc = ((2 * bits - 1) * ws[:, None]).sum(axis=0)
    fp = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            fp |= np.uint64(1) << np.uint64(i)
    return int(fp.astype(np.int64))


@F.pandas_udf(LongType())
def simhash_text(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized simhash over raw text: tokenize (lowercase alnum
    runs), count, weighted-bit fingerprint. One numpy pass per row's unique
    tokens; Arrow batch transfer only."""
    import re

    splitter = re.compile(r"[^a-z0-9]+")
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = [x for x in splitter.split(t.lower()) if x]
        if not toks:
            continue
        counts: dict[str, int] = {}
        for x in toks:
            counts[x] = counts.get(x, 0) + 1
        out[i] = simhash_counter(counts)
    return pd.Series(out)


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def is_similar(a: Column, b: Column, max_hamming: int = 3) -> Column:
    """ref crawler/simhash.py:35-48 + worker.py:36: ≥0.95·64 equal bits."""
    return hamming64(a, b) <= max_hamming


def band_key(sim: Column, band: int) -> Column:
    """16-bit band ``band`` (0..3) of the fingerprint, as a small long."""
    return F.shiftright(sim, band * BAND_BITS).bitwiseAND(F.lit((1 << BAND_BITS) - 1))


def with_bands(df: DataFrame, sim_col: str = "simhash") -> DataFrame:
    """Explode each row into its N_BANDS (band_id, band_val) keys."""
    bands = F.array(
        *[
            F.struct(F.lit(b).alias("band_id"), band_key(F.col(sim_col), b).alias("band_val"))
            for b in range(N_BANDS)
        ]
    )
    return df.withColumn("band", F.explode(bands)).select(
        "*", F.col("band.band_id").alias("band_id"), F.col("band.band_val").alias("band_val")
    ).drop("band")


def lsh_similar_pairs(
    df: DataFrame,
    id_col: str,
    sim_col: str = "simhash",
    max_hamming: int = 3,
) -> DataFrame:
    """All (id_a < id_b) pairs with Hamming(simhash) ≤ max_hamming.

    Plan: band-explode → shuffle once on (band_id, band_val) → equi-join
    within buckets → exact bit_count verify → distinct. Recall is exact for
    max_hamming ≤ N_BANDS-1 (pigeonhole). At 10^10 scale the band join is
    the only shuffle and is skew-safe under AQE (band values are ~uniform).
    """
    a = with_bands(df.select(F.col(id_col).alias("id_a"), F.col(sim_col).alias("sim_a")), "sim_a")
    b = with_bands(df.select(F.col(id_col).alias("id_b"), F.col(sim_col).alias("sim_b")), "sim_b")
    pairs = (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(is_similar(F.col("sim_a"), F.col("sim_b"), max_hamming))
        .select("id_a", "id_b")
        .distinct()
    )
    return pairs
