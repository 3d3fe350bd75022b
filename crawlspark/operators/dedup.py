"""Deduplication operators for large-scale training-data pipelines.

Exact (hash-groupBy), MinHash+LSH, n-gram Jaccard, SimHash, and
embedding-cosine near-dup — each expressed as pure DataFrame ops with a
deterministic cross-engine hash (``int(md5(x)[:15], 16)``, 60-bit) so the
DuckDB oracle can compute byte-identical results.

Scale notes (the 100 TB story):
- exact dedup: one hash aggregate — map-side partial, minimal shuffle;
- n-gram Jaccard: shingle-explode → equi-join on the shingle (inverted
  index join), count per pair, exact Jaccard via |A∩B|/(|A|+|B|−|A∩B|) —
  no cross join ever materializes; hot shingles are the skew risk →
  drop top-frequency shingles (stopword-shingle cut, like common dedup
  pipelines) or rely on AQE skew splitting;
- MinHash LSH: k=32 min-hashes → 16 bands of 2 → bucket join on
  (band, bandkey): candidate pairs ∝ true dups, then exact-verify.
  P(miss | J=0.8) = (1−0.8²)^16 ≈ 8e-8 — effectively recall 1 at any
  verification threshold ≥ 0.8;
- embedding cosine: pairs via a cheap blocking key when available, else
  brute within partition; here exact threshold join for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawlspark.functions.text import md5_int60, tokens, word_ngrams

MINHASH_K = 32
MINHASH_BANDS = 16  # rows per band = 2


# persist registry (ADVICE r2): intermediates cached inside the dedup
# entry points are released on the NEXT invocation of any entry point —
# bench loops and multi-round use would otherwise accumulate cached
# blocks in executor storage forever. Unpersisting a frame a still-held
# lazy plan references is safe (it just recomputes).
_LIVE_CACHES: list[DataFrame] = []


def _persist(df: DataFrame) -> DataFrame:
    _LIVE_CACHES.append(df.persist())
    return df


def release_caches() -> None:
    while _LIVE_CACHES:
        try:
            _LIVE_CACHES.pop().unpersist()
        except Exception:
            pass


def _spread(df: DataFrame, min_bytes: int = 0) -> DataFrame:
    """Small-file guard: a sub-128MB parquet input arrives as ONE
    partition and serializes every downstream expression onto one core
    (the sf0.1 bench read 5000 docs as a single task). Spread the input
    across the cluster's cores before the expression-heavy stages; the
    shuffle moves only the raw rows once. Unconditional by default —
    probing the current partition count via df.rdd builds an RDD plan
    per invocation (VERDICT r2), and AQE coalesces the shuffle back
    down when the input is already wide.

    ``min_bytes`` (opt-in, for RAW-SCAN inputs only): skip the
    repartition when Catalyst's optimized-plan size estimate is below
    the threshold — at kilobyte scale the fixed shuffle+stage cost
    (~0.3–0.5 s) exceeds anything the parallelized expression work can
    save, while at megabyte scale the serial scan dominates. The
    estimate is driver-side (no job) and exact for plain parquet scans;
    call sites with opaque upstream plans (UDF outputs, unions) must
    keep the default 0 — their estimates are unreliable and a wrongly
    skipped spread serializes the whole stage."""
    if min_bytes:
        try:
            est = int(
                str(
                    df._jdf.queryExecution()
                    .optimizedPlan()
                    .stats()
                    .sizeInBytes()
                )
            )
            if 0 <= est < min_bytes:
                return df
        except Exception:
            pass
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


# raw-scan spread threshold (on Catalyst's COLUMN-PRUNED scan
# estimate): ~1 MB of compressed text ≈ the point where one-core
# tokenization (~1-2 s) overtakes the fixed repartition cost; below it
# the spread is pure overhead. The sandbox corpora probe at ~0.2 MB
# (sf0.1 — skip) and ~2 MB (sf1.0 — spread), 2-5x margins either way.
SPREAD_MIN_SCAN_BYTES = 1 << 20


def text_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column."""
    return F.array_distinct(word_ngrams(tokens(text), n))


def exact_dup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(text_hash, n_dups) for content appearing more than once."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.count("*").alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


def prefix_fingerprint_groups(
    df: DataFrame, id_col: str, text_col: str = "text", n_tokens: int = 4
) -> DataFrame:
    """Soft exact-dedup: group by the md5 of the first ``n_tokens``
    tokens (catches boilerplate/header dups that full-hash misses)."""
    prefix = F.concat_ws(" ", F.slice(tokens(F.col(text_col)), 1, n_tokens))
    return (
        df.groupBy(F.md5(prefix).alias("prefix_hash"))
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("min_id"))
        .filter(F.col("n_docs") > 1)
    )


def passage_dedup(
    df: DataFrame, id_col: str, text_col: str = "text", window: int = 16
) -> DataFrame:
    """Passage-level exact dedup (the RefinedWeb/CCNet line-dedup shape
    adapted to unstructured text): chunk each document's tokens into
    consecutive ``window``-word passages, keep exactly ONE copy of each
    distinct passage corpus-wide (the lexicographically-first
    (doc_id, pos) occurrence), and rebuild each document from its kept
    passages in order.

    Returns (doc_id, n_passages, n_kept, clean_text) for every input
    document — docs whose every passage was seen earlier come back with
    n_kept = 0 and clean_text = ''.

    Scale notes (100 TB): the exploded passage table is ~#tokens/window
    rows; the keeper rule is one hash aggregate on the passage hash
    (map-side partial min(struct)) + an equi-join back on the same key —
    no window function over a skewed partition, so a boilerplate passage
    appearing in 10^8 documents is one aggregate cell, and AQE handles
    the join-side skew. Rebuild is one groupBy(doc) with an in-group
    array_sort (passages per doc is bounded by doc length / window).
    """
    toks = tokens(F.col(text_col))
    n_pass = F.ceil(F.size(toks) / F.lit(float(window))).cast("int")
    passages = F.transform(
        F.sequence(F.lit(0), n_pass - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * window + 1, window)),
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(n_pass, F.lit(0)).alias("n_passages"),
        F.when(n_pass > 0, passages).otherwise(F.array().cast("array<string>")).alias("_ps"),
    )
    occ = base.select(
        "doc_id", F.posexplode("_ps").alias("pos", "p")
    ).withColumn("h", F.md5("p"))
    keeper = occ.groupBy("h").agg(
        F.min(F.struct("doc_id", "pos")).alias("k")
    )
    kept = occ.join(keeper, "h").filter(
        (F.col("doc_id") == F.col("k.doc_id")) & (F.col("pos") == F.col("k.pos"))
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "p"))),
                lambda x: x["p"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        base.select("doc_id", "n_passages")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_passages",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs via a PREFIX-FILTERED inverted index
    (AllPairs/PPJoin, Bayardo et al. WWW'07): only each document's
    (|X| − ceil(t·|X|) + 1) rarest shingles are indexed — any pair with
    Jaccard ≥ t provably collides inside these prefixes — then |A∩B| is
    verified exactly per candidate with a sorted-array intersection;
    |A∪B| = |A|+|B|−|A∩B| from per-doc shingle counts — never a cross
    join, and never the full Σdf² pair enumeration of a whole-set index.

    ``max_shingle_df``: the skew guard for web-scale corpora. A shingle
    appearing in d documents contributes d² rows to the inverted-index
    join — one boilerplate shingle in 10^6 docs is a 10^12-row hot key.
    Setting a document-frequency cap drops such shingles from BOTH the
    index and the per-doc sizes, i.e. Jaccard is computed exactly over
    the capped shingle space (the standard stopword-shingle cut). None
    (default) keeps the fully exact semantics the DuckDB oracle checks.

    The inverted index is keyed on ``xxhash64(shingle)`` rather than the
    shingle string: the self-join and groupBy then shuffle/compare 8-byte
    longs instead of variable-length n-gram strings (~25% faster at
    sf0.1, and the gap widens with shingle length at web scale).
    Counts are identical to the string-keyed join unless two distinct
    shingles of the same document pair collide in 64 bits (probability
    ~|shingles|²/2^65 — ≈1e-9 at a billion distinct shingles)."""
    release_caches()
    df = _spread(df)
    # persisted: sh feeds the document-frequency aggregate AND the ranked/
    # array branches — without it the shingle UDF re-evaluates per branch
    sh = _persist(
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(text_shingles_udf(n)(F.col(text_col))).alias("s"),
        ).select("doc", F.xxhash64("s").alias("sh"))
    )
    dfc = sh.groupBy("sh").agg(F.count("*").alias("df"))
    if max_shingle_df is not None:
        dfc = dfc.filter(F.col("df") <= max_shingle_df)
    # AllPairs/PPJoin prefix filtering (Bayardo et al., WWW'07), exact:
    # under any TOTAL global shingle order, two sets with Jaccard >= t
    # must collide inside their (|X| - ceil(t·|X|) + 1)-element prefixes —
    # so the inverted index holds only each document's prefix, ordered
    # rarest-first (df asc, sh asc), instead of its full shingle set.
    # The former full-index self-join put sum(df²) rows through the join
    # and aggregated one row per sharing pair (measured sf1.0/50k docs:
    # 2.57e8 join rows → 1.14e8 candidate pairs, ~32 s); the prefix index
    # collides only pairs that share a RARE shingle, and the exact
    # verify is one array_intersect per surviving candidate.
    # t' = t − 1e-6 covers pairs whose ROUNDED jaccard reaches t (the
    # output filter rounds to 6 dp, so j >= t − 5e-7 can survive it).
    t_eff = threshold - 1e-6
    # dfc is vocabulary-sized (distinct shingles), never corpus-sized —
    # the broadcast is the standard term-statistics side table.
    # ONE groupBy(doc) aggregate (no window: the per-doc sets are array-
    # sized, so the rarity ranking is an in-group array_sort over
    # (df, sh) structs) yields BOTH derived tables — the prefix array
    # for the candidate index and the sorted hash array for the exact
    # verify — and is persisted: the candidate self-join and the two
    # verify joins would otherwise re-evaluate the whole join+aggregate
    # chain once per branch (measured 3 evaluations at sf1.0).
    per_doc = _persist(
        sh.join(F.broadcast(dfc), "sh")
        .groupBy("doc")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("df", "sh"))
            ).alias("_ranked"),
        )
        .select(
            "doc",
            F.size("_ranked").alias("sz"),
            F.transform(
                F.slice(
                    "_ranked",
                    1,
                    F.greatest(
                        F.size("_ranked")
                        - F.ceil(F.lit(t_eff) * F.size("_ranked")).cast("int")
                        + 1,
                        F.lit(0),
                    ),
                ),
                lambda x: x["sh"],
            ).alias("prefix_arr"),
            F.sort_array(
                F.transform("_ranked", lambda x: x["sh"])
            ).alias("arr"),
        )
    )
    prefix = per_doc.select(
        "doc",
        "sz",
        F.posexplode("prefix_arr").alias("rn0", "sh"),
    ).select("doc", "sh", "sz", (F.col("rn0") + 1).alias("rn"))
    # candidates: prefix-prefix collision + length filter
    # (t·|A| <= |B| <= |A|/t — a necessary condition of Jaccard >= t)
    # + PPJoin's positional filter: a collision at prefix ranks
    # (rn_a, rn_b) bounds the overlap by 1 + min(|A|−rn_a, |B|−rn_b),
    # and Jaccard >= t needs overlap >= t/(1+t)·(|A|+|B|); collisions
    # whose bound can't reach it are dropped before the distinct (safe:
    # the bound always dominates the true overlap, so a qualifying
    # pair's collisions all survive). Measured sf1.0: 7.2e6 → fewer
    # candidate rows into the array-verify joins.
    req = F.lit(t_eff / (1.0 + t_eff)) * (F.col("sz_a") + F.col("sz_b"))
    cand = (
        prefix.select(
            F.col("doc").alias("id_a"), "sh",
            F.col("sz").alias("sz_a"), F.col("rn").alias("rn_a"),
        )
        .join(
            prefix.select(
                F.col("doc").alias("id_b"), "sh",
                F.col("sz").alias("sz_b"), F.col("rn").alias("rn_b"),
            ),
            "sh",
        )
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("sz_b") >= F.lit(t_eff) * F.col("sz_a"))
            & (F.col("sz_b") <= F.col("sz_a") / F.lit(t_eff))
            & (
                1
                + F.least(
                    F.col("sz_a") - F.col("rn_a"), F.col("sz_b") - F.col("rn_b")
                )
                >= req
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # exact verify on candidates only: |A∩B| via sorted-hash-array
    # intersection (52-element arrays at the bench shape); |A∪B| from the
    # sizes. Identical integers to the former join-count, so the rounded
    # jaccard and the >= threshold cut are bit-identical.
    return (
        cand.join(
            per_doc.select(
                F.col("doc").alias("id_a"), F.col("arr").alias("sa"), F.col("sz").alias("sz_a")
            ),
            "id_a",
        )
        .join(
            per_doc.select(
                F.col("doc").alias("id_b"), F.col("arr").alias("sb"), F.col("sz").alias("sz_b")
            ),
            "id_b",
        )
        .withColumn("inter", F.size(F.array_intersect(F.col("sa"), F.col("sb"))))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# Affine minhash family over the Mersenne prime 2^31-1: ONE md5 per
# shingle (base = md5_int60(s) % P), then k cheap (a·base+b) % P minima.
# The salted-md5-per-permutation variant costs k md5s per shingle — 32x
# the hashing — and dominated the sf0.1 bench (52 s); this family is the
# standard a·x+b mod p permutation approximation, byte-reproducible in
# DuckDB (all int64 arithmetic, products < 2^62 so neither engine
# overflows). Constants derive from a fixed LCG so both engines inline
# identical literals.
MINHASH_PRIME = 2147483647


def _mh_constants(k: int = MINHASH_K) -> list[tuple[int, int]]:
    out, x = [], 88172645463325252
    for _ in range(k):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = x % (MINHASH_PRIME - 1) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = x % MINHASH_PRIME
        out.append((a, b))
    return out


MINHASH_AB = _mh_constants()


def minhash_signatures(base: DataFrame, id_col: str = "doc",
                       shingle_col: str = "shs", k: int = MINHASH_K) -> DataFrame:
    """(doc, h0..h{k-1}) minhash signature table via explode + one hash
    aggregate. Deliberately NOT array higher-order functions: transform/
    array_min lambdas are interpreted per element (no whole-stage
    codegen) and measured ~100x slower than this shape — explode to one
    row per (doc, shingle), k plain arithmetic projections (codegen'd),
    map-side partial min, tiny shuffle keyed by doc."""
    ex = base.select(
        F.col(id_col).alias("doc"), F.explode(F.col(shingle_col)).alias("s")
    ).select(
        "doc", F.pmod(md5_int60(F.col("s")), F.lit(MINHASH_PRIME)).alias("b")
    )
    return ex.groupBy("doc").agg(
        *[
            F.min(
                F.pmod(
                    F.lit(MINHASH_AB[i][0]) * F.col("b") + F.lit(MINHASH_AB[i][1]),
                    F.lit(MINHASH_PRIME),
                )
            ).alias(f"h{i}")
            for i in range(k)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """MinHash-LSH candidates (band bucket join) + exact Jaccard verify.

    Output equals ``ngram_jaccard_pairs`` whenever no true pair is missed
    by banding (P(miss) ≤ (1−τ^(k/bands))^bands — negligible for τ ≥ 0.5
    with k=32, b=16)."""
    rows = k // bands
    release_caches()
    df = _spread(df)
    # persisted: base feeds the banding AND both sides of the verify
    # join — shingles and the k minhash values come out of ONE fused
    # Arrow pass (guide §4.2): the former pipeline re-tokenized via the
    # shingle UDF, then exploded the shingle arrays back into one row
    # per (doc, shingle) only to run an md5 + k modular projections and
    # a k-column min aggregate in the JVM (a corpus-sized explode and an
    # extra shuffle, both now gone — the per-doc numpy min is the same
    # frozen (a·b + c) mod P family, bit-identical values).
    x = shingle_minhash_udf(n, k)(F.col(text_col))
    base = _persist(df.select(
        F.col(id_col).alias("doc"), x.alias("x")
    ).select("doc", F.col("x.shs").alias("shs"), F.col("x.sig").alias("sig")))
    # band key: 8-byte xxhash64 of the band's signature slice instead of
    # a 32-char md5 string (guide §2.3 — narrower shuffle keys; a band
    # collision is still verified exactly below, so a 64-bit key
    # collision can only add a candidate, never change the output)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    F.concat_ws(
                        ":",
                        *[
                            F.element_at("sig", b * rows + r + 1)
                            for r in range(rows)
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    # NOT persisted: the band explode re-derives from the cached base in
    # each join branch for less than one extra materialization barrier
    banded = (
        base.filter(F.col("sig").isNotNull())
        .select("doc", F.explode(band_structs).alias("bk"))
        .select(
            "doc", F.col("bk.band_id").alias("band_id"), F.col("bk.band_key").alias("band_key")
        )
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band_id", "band_key"])
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(F.col("x.doc").alias("id_a"), F.col("y.doc").alias("id_b"))
        .distinct()
    )
    # Exact verify on CANDIDATES ONLY: join each candidate pair to its two
    # (distinct) shingle arrays and compute Jaccard per pair — work is
    # O(candidates), never the full inverted-index pair enumeration. This
    # is the whole point of LSH: candidate count ∝ true duplicates.
    sa = base.select(F.col("doc").alias("id_a"), F.col("shs").alias("sa"))
    sb = base.select(F.col("doc").alias("id_b"), F.col("shs").alias("sb"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size(F.col("sa")) + F.size(F.col("sb")) - inter
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash60(text: Column) -> Column:
    """60-bit expression-only simhash over token counts (md5_int60 token
    hash; bit i set iff Σ ±count > 0). Pure column ops → has an exact SQL
    twin; the crawl engine's 64-bit pandas-UDF simhash lives in
    functions/simhash.py — this is the relational variant for dedup."""
    toks = tokens(text)
    uniq = F.array_distinct(toks)
    # per unique token: (hash, count)
    pairs = F.transform(
        uniq,
        lambda t: F.struct(
            md5_int60(t).alias("h"),
            F.size(F.filter(toks, lambda x: x == t)).alias("c"),
        ),
    )
    fp = F.lit(0).cast("long")
    for i in range(60):
        bit_sum = F.aggregate(
            pairs,
            F.lit(0).cast("long"),
            lambda acc, p: acc
            + F.when(
                F.shiftright(p["h"], i).bitwiseAND(F.lit(1)) == 1, p["c"]
            ).otherwise(-p["c"]),
        )
        fp = fp + F.when(bit_sum > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))
    return fp


def embedding_neardup_pairs(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95, n_blocks: int = 8,
) -> DataFrame:
    """EXACT (id_a < id_b) pairs with cosine >= threshold, via a blocked
    all-pairs GEMM join — no Spark crossJoin node ever appears in the plan.

    Why blocked instead of LSH here: at a loose threshold (e.g. 0.45 over
    isotropic vectors) hyperplane LSH cannot prune without losing recall
    (p_bit ≈ 1 − θ/π is near ½), so "exact" IS the semantics; the job is
    to make the inherent O(N²/2) dot products BLAS-bound and memory-safe:

    - every vector gets a block id b ∈ [0, B);
    - a tiny driver-built map replicates each vector into the B unordered
      block pairs containing its block (shuffle volume N·B rows — choose
      B ≈ sqrt(N·dim·8 / executor_mem) so a block pair fits in memory);
    - ``applyInPandas`` per block pair computes the cosine sub-matrix with
      one numpy matmul and emits only rows ≥ threshold.

    For TRUE near-dup regimes (threshold ≥ ~0.8) use
    ``embedding_neardup_lsh_pairs`` — candidates ∝ duplicates, not N².
    Values are rounded to 6 dp (absorbs summation-order differences) so
    the DuckDB oracle matches bit-for-bit."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    pair_rows = []
    pid = 0
    for i in range(n_blocks):
        for j in range(i, n_blocks):
            pair_rows.append((pid, i, "a", i == j))
            if j != i:
                pair_rows.append((pid, j, "b", False))
            pid += 1
    spark = df.sparkSession
    pairmap = spark.createDataFrame(
        pair_rows, "pid int, block int, role string, diag boolean"
    )

    vecs = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("block"),
    )
    rep = vecs.join(F.broadcast(pairmap), "block")

    # output id columns take the INPUT id column's type — long, string, …
    # (a hardcoded LongType broke non-long ids; ADVICE r2)
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def _unit_rows(m: np.ndarray) -> np.ndarray:
        # zero-norm vectors normalize to the zero row (cosine 0 with
        # everything → explicitly no-match) instead of NaN (ADVICE r2)
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        nrm[nrm == 0.0] = np.inf
        return m / nrm

    def block_pair(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=object),
                "id_b": pd.Series([], dtype=object),
                "cosine": pd.Series([], dtype=float),
            }
        )
        diag = bool(pdf["diag"].iloc[0]) if len(pdf) else True
        a = pdf[pdf["role"] == "a"]
        b = pdf[pdf["role"] == "b"]
        if len(a) == 0 or (not diag and len(b) == 0):
            return empty
        ids_a = a["vid"].to_numpy()
        mat_a = _unit_rows(np.stack(a["v"].to_numpy()).astype(np.float64))
        if diag:  # diagonal block: distinct pairs of A×A
            ids_b, mat_b = ids_a, mat_a
        else:
            ids_b = b["vid"].to_numpy()
            mat_b = _unit_rows(np.stack(b["v"].to_numpy()).astype(np.float64))
        cos = np.round(mat_a @ mat_b.T, 6)
        ii, jj = np.where(cos >= threshold)
        ia, ib, cs = ids_a[ii], ids_b[jj], cos[ii, jj]
        keep = ia != ib
        ia, ib, cs = ia[keep], ib[keep], cs[keep]
        # np.where (not np.minimum) so object-dtype ids (strings) order too
        swap = ia > ib
        lo, hi = np.where(swap, ib, ia), np.where(swap, ia, ib)
        outp = pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": cs})
        return outp.drop_duplicates(["id_a", "id_b"])

    return (
        rep.groupBy("pid")
        .applyInPandas(block_pair, out_schema)
        .select("id_a", "id_b", "cosine")
    )


def embedding_neardup_lsh_pairs(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.9, bits: int = 12, n_tables: int = 8,
) -> DataFrame:
    """Scale-path near-dup: hyperplane-LSH bucket collisions as candidates
    (operators/similarity.sketch), exact cosine verify on candidates only
    — O(collisions), never N². Recall per pair at angle θ is
    1 − (1 − (1−θ/π)^bits)^n_tables; at near-dup thresholds (≥0.9,
    θ ≤ 26°) the defaults give ~1-1e-5 recall. ``bits`` sizes the bucket
    space: false candidates fall ~2× per extra bit while true-pair recall
    decays only as p_bit^bits (p_bit ≈ 0.97 at θ ≈ 5°), so more bits is
    the cheap lever against candidate explosion at scale. Verify is a
    per-bucket numpy GEMM (each bucket's vectors arrive once, inside the
    sketch rows); rounding to 6 dp absorbs the summation-order
    difference vs the sequential-sum DuckDB oracle, exactly as
    ``embedding_neardup_pairs`` does."""
    import numpy as np
    import pandas as pd

    from crawlspark.operators.similarity import sketch

    release_caches()
    # _spread first: a small parquet input is ONE partition and would
    # run the sketch stage serially.
    df = _spread(df.select(F.col(id_col), F.col(vec_col)))
    # Per-BUCKET GEMM verify (guide §8: move the heavy bytes once): the
    # sketch rows carry their vector, one groupBy((table, bucket)) ships
    # each vector once per table (~N·tables vector rows), and every
    # bucket verifies its own pairs with one numpy matmul — emitting
    # only the >= threshold survivors. The former shape materialized the
    # DISTINCT candidate pairs first and joined BOTH vectors back onto
    # every pair: at sf1.0 that was 2.4e6 pairs x 2 full vectors
    # (~15x the bytes) through the joins and the Arrow verify UDF, and
    # it was the query's dominant, memory-pressure-sensitive stage.
    # Same math as embedding_neardup_pairs' blocked GEMM (unit rows,
    # np.round to 6 dp, zero-norm rows match nothing); a pair colliding
    # in several tables resolves deterministically via min(cosine) —
    # the rounded value is identical across tables except at
    # astronomically-rare ULP boundaries.
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    from collections.abc import Iterator as _Iter

    def bucket_pairs(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        # one partition holds whole buckets (hash-repartitioned on the
        # bucket key below); concat its Arrow batches, then slice bucket
        # groups out of ONE sorted matrix — per-group work is a numpy
        # view + matmul, no per-group pandas frame construction
        parts = [p for p in batches if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        key = pdf["table_id"].to_numpy().astype(np.int64) * (1 << 44) + pdf[
            "bucket"
        ].to_numpy()
        order = np.argsort(key, kind="stable")
        key = key[order]
        ids = pdf["vec_id"].to_numpy()[order]
        mat = np.stack(pdf["v"].to_numpy()[order]).astype(np.float64)
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        nrm[nrm == 0.0] = np.inf
        mat = mat / nrm
        cuts = np.nonzero(np.diff(key))[0] + 1
        starts = np.concatenate(([0], cuts))
        ends = np.concatenate((cuts, [len(key)]))
        outs: list[pd.DataFrame] = []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            sub = mat[s:e]
            cos = np.round(sub @ sub.T, 6)
            iu, ju = np.triu_indices(n, k=1)
            keep = cos[iu, ju] >= threshold
            if not keep.any():
                continue
            ia, ib = ids[s + iu[keep]], ids[s + ju[keep]]
            cs = cos[iu, ju][keep]
            swap = ia > ib
            outs.append(
                pd.DataFrame(
                    {
                        "id_a": np.where(swap, ib, ia),
                        "id_b": np.where(swap, ia, ib),
                        "cosine": cs,
                    }
                )
            )
        if outs:
            yield pd.concat(outs, ignore_index=True)

    skv = sketch(
        df, bits=bits, n_tables=n_tables, id_col=id_col, vec_col=vec_col,
        carry_vec=True,
    )
    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        skv.repartition(par, "table_id", "bucket")
        .mapInPandas(bucket_pairs, out_schema)
        .groupBy("id_a", "id_b")
        .agg(F.min("cosine").alias("cosine"))
    )


import re as _re
from hashlib import md5 as _md5

import numpy as _np
import pandas as _pd
from pyspark.sql.functions import pandas_udf as _pandas_udf
from pyspark.sql.types import LongType as _LongType

from crawlspark.functions.text import TOKEN_SPLIT_REGEX as _TOKRE

_SPLIT = _re.compile(_TOKRE)


def text_shingles_udf(n: int):
    """Arrow pandas-UDF twin of ``text_shingles`` — identical distinct
    word n-grams, built with Python re instead of the interpreted
    filter/transform HOF chain (the shingle stage dominated the
    inverted-index queries' profile). The split regex behaves identically
    under Java and Python re on this token alphabet — the same reliance
    the conformance-proven Arrow simhash path already makes. Texts with
    fewer than n tokens yield an empty shingle set (the expression path
    never handled that case — element_at(toks, 0) raises)."""

    @_pandas_udf(T.ArrayType(T.StringType()))
    def f(texts: _pd.Series) -> _pd.Series:
        out = []
        for t in texts:
            toks = [x for x in _SPLIT.split((t or "").lower()) if x]
            m = len(toks) - n + 1
            sh = [" ".join(toks[i : i + n]) for i in range(m)] if m > 0 else []
            out.append(list(dict.fromkeys(sh)))
        return _pd.Series(out)

    return f


def shingle_minhash_udf(n: int, k: int = MINHASH_K):
    """Fused Arrow twin of ``text_shingles_udf`` + ``minhash_signatures``:
    one pass over the text yields (shs, sig) — the distinct word-n-gram
    shingles as their 60-bit md5 hashes AND the k-wide minhash
    signature, with NO corpus-sized explode or extra shuffle between
    them. Values are bit-identical to the relational pipeline: the base
    hash is the shared 60-bit md5 (int(md5(s)[:15], 16), the exact
    ``md5_int60`` formula) reduced mod the Mersenne prime for the
    signatures, and the k permutations are the same frozen
    ``MINHASH_AB`` affine family evaluated in int64 (products < 2^62 —
    no overflow, same as the JVM path). The verify stage intersects the
    60-bit hash arrays instead of shingle strings (guide §2.3 — 8-byte
    elements instead of ~25-char strings through the shuffle and the
    intersect); counts differ only if two distinct shingles of one
    document pair collide in 60 bits (~|shingles|²/2^61 — the same
    documented stance as ngram_jaccard_pairs' hashed inverted index).
    Documents with no shingles get ``sig = NULL`` (they never entered
    the signature aggregate before either)."""
    A = _np.array([a for a, _ in MINHASH_AB[:k]], dtype=_np.int64)
    B = _np.array([b for _, b in MINHASH_AB[:k]], dtype=_np.int64)
    P = MINHASH_PRIME

    @_pandas_udf(
        T.StructType(
            [
                T.StructField("shs", T.ArrayType(T.LongType())),
                T.StructField("sig", T.ArrayType(T.LongType())),
            ]
        )
    )
    def f(texts: _pd.Series) -> _pd.DataFrame:
        shs_out: list = []
        sig_out: list = []
        for t in texts:
            toks = [x for x in _SPLIT.split((t or "").lower()) if x]
            m = len(toks) - n + 1
            sh = list(
                dict.fromkeys(
                    " ".join(toks[i : i + n]) for i in range(m)
                )
            ) if m > 0 else []
            if not sh:
                shs_out.append([])
                sig_out.append(None)
                continue
            h60 = _np.array(
                [int(_md5(s.encode()).hexdigest()[:15], 16) for s in sh],
                dtype=_np.int64,
            )
            shs_out.append(h60)
            base = h60 % P
            sig_out.append((A[None, :] * base[:, None] + B[None, :]) % P)
        return _pd.DataFrame(
            {
                "shs": shs_out,
                "sig": [s if s is None else s.min(axis=0) for s in sig_out],
            }
        )

    return f


@_pandas_udf(T.DoubleType())
def _cosine_pudf(va: _pd.Series, vb: _pd.Series) -> _pd.Series:
    """Row-wise cosine of two array<double> columns, Arrow-batched numpy.
    Zero-norm vectors yield cosine 0 (no-match), matching
    embedding_neardup_pairs' convention."""
    if len(va) == 0:
        return _pd.Series([], dtype=float)
    a = _np.stack(va.to_numpy()).astype(_np.float64)
    b = _np.stack(vb.to_numpy()).astype(_np.float64)
    dot = _np.einsum("ij,ij->i", a, b)
    den = _np.linalg.norm(a, axis=1) * _np.linalg.norm(b, axis=1)
    den[den == 0.0] = _np.inf
    return _pd.Series(dot / den)


@_pandas_udf(_LongType())
def simhash60_udf(texts: _pd.Series) -> _pd.Series:
    """Arrow pandas-UDF twin of ``simhash60`` — identical output (md5
    60-bit token hashes, weighted-bit sign), far faster than the 60-term
    expression tree for wide corpora. The DuckDB oracle stays the
    expression formula; both produce the same value."""
    out = _np.zeros(len(texts), dtype=_np.int64)
    for i, t in enumerate(texts):
        counts: dict[str, int] = {}
        for tok in _SPLIT.split((t or "").lower()):
            if tok:
                counts[tok] = counts.get(tok, 0) + 1
        if not counts:
            continue
        hs = _np.array(
            [int(_md5(tok.encode()).hexdigest()[:15], 16) for tok in counts],
            dtype=_np.uint64,
        )
        ws = _np.array(list(counts.values()), dtype=_np.int64)
        bits = ((hs[:, None] >> _np.arange(60, dtype=_np.uint64)[None, :]) & _np.uint64(1)).astype(_np.int64)
        acc = ((2 * bits - 1) * ws[:, None]).sum(axis=0)
        fp = 0
        for b in range(60):
            if acc[b] > 0:
                fp |= 1 << b
        out[i] = fp
    return _pd.Series(out)


# -- dedup clusters: connected components over the near-dup pair graph --
# The stage industry dedup pipelines run AFTER pair generation: group
# transitive near-dups into clusters and keep one canonical document per
# cluster. (The reference has no analog — this is the LLM-training-data
# surface SURVEY.md §6 scopes on top of the crawl tables.)

# scratch dirs created by connected_components, removed at interpreter
# exit (the returned DataFrame lazily reads the final labels parquet, so
# the dir must outlive the call; superseded per-iteration dirs are
# deleted eagerly inside the loop).
_CC_SCRATCH_DIRS: list[str] = []


def _cc_cleanup() -> None:
    import shutil as _shutil

    while _CC_SCRATCH_DIRS:
        _shutil.rmtree(_CC_SCRATCH_DIRS.pop(), ignore_errors=True)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int | None = None,
    stats: dict | None = None,
    small_graph_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components of the undirected pair graph: every vertex's
    label converges to the smallest vertex id reachable from it. Returns
    (v, comp).

    Each iteration combines min-label propagation over the edges with
    POINTER DOUBLING (``comp := min(comp, comp[comp])`` via a labels
    self-join), so the per-vertex label distance to the component minimum
    at least halves every round — convergence is O(log diameter)
    iterations, not O(diameter). A 1000-hop template/boilerplate chain at
    web scale finishes in ~10 rounds instead of 1000. Each iteration
    shuffles O(E + V) rows with no driver-side graph state.

    Iteration state is materialized to parquet scratch each step so the
    plan/lineage stays flat no matter how many iterations run (iterative
    localCheckpoint/persist chains degrade the driver); superseded
    iteration dirs are deleted eagerly and the final dir is removed at
    interpreter exit. ``max_iter`` is an optional safety cap: when hit,
    the current (possibly unconverged) labels are returned rather than
    failing the job — by default the loop runs to convergence, which
    pointer doubling bounds at ~log2(|V|) rounds. Pass ``stats`` to
    receive {"iterations": n, "converged": bool, "mode": str}.

    ``small_graph_threshold`` is the scale gate: if the (symmetrized)
    edge list has at most this many rows it is collected to the driver
    and solved with union-find in one pass — post-LSH near-dup graphs
    are typically tiny relative to the corpus (sparse pair output), and
    the iterative path's fixed cost (2 Spark jobs + a parquet write per
    iteration) dwarfs a sub-second driver solve. 1M edge rows ≈ tens of
    MB collected. Above the threshold the distributed pointer-doubling
    loop runs unchanged — that is the 100-TB path. Set 0 to force the
    distributed loop. The edge count is read from the already-written
    edges parquet (footer metadata count — no extra scan).
    """
    import atexit as _atexit
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    spark = pairs.sparkSession
    scratch = _tempfile.mkdtemp(prefix="crawlspark_ccomp_")
    if not _CC_SCRATCH_DIRS:
        _atexit.register(_cc_cleanup)
    _CC_SCRATCH_DIRS.append(scratch)

    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ep = _os.path.join(scratch, "edges")
    edges.write.mode("overwrite").parquet(ep)
    edges = spark.read.parquet(ep)

    if small_graph_threshold and edges.count() <= small_graph_threshold:
        # Small-graph fast path: one collect + driver union-find replaces
        # the whole iterative loop. Every vertex appears as src in the
        # symmetrized edge list, so no separate vertex scan is needed.
        parent: dict = {}

        def _find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        # the edges parquet was just written to local scratch — read it
        # back with pyarrow (two flat columns) instead of materializing
        # O(edges) Spark Row objects on the driver; fall back to collect
        # if the path isn't locally readable (remote scratch)
        try:
            import pyarrow.parquet as _pqt

            _tbl = _pqt.read_table(ep, columns=["src", "dst"])
            edge_iter = zip(
                _tbl.column("src").to_pylist(), _tbl.column("dst").to_pylist()
            )
        except Exception:
            edge_iter = (
                (row["src"], row["dst"]) for row in edges.collect()
            )
        for s, d in edge_iter:
            if s not in parent:
                parent[s] = s
            if d not in parent:
                parent[d] = d
            rs, rd = _find(s), _find(d)
            if rs != rd:
                parent[rd] = rs
        comp_min: dict = {}
        for v in parent:
            r = _find(v)
            m = comp_min.get(r)
            if m is None or v < m:
                comp_min[r] = v
        out_schema = T.StructType(
            [
                T.StructField("v", edges.schema["src"].dataType),
                T.StructField("comp", edges.schema["src"].dataType),
            ]
        )
        result = spark.createDataFrame(
            [(v, comp_min[_find(v)]) for v in parent], out_schema
        )
        if stats is not None:
            stats["iterations"] = 0
            stats["converged"] = True
            stats["mode"] = "driver"
        # nothing lazy references the scratch anymore — reclaim it now
        _CC_SCRATCH_DIRS.remove(scratch)
        _shutil.rmtree(scratch, ignore_errors=True)
        return result

    labels = (
        edges.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("comp", F.col("v"))
    )
    # Convergence detection without an extra job OR an extra confirming
    # iteration: per-vertex labels are MONOTONE non-increasing, so the
    # hop step changed nothing iff Σcomp(hopped) == Σcomp(previous
    # labels) — and hop-no-change implies comp is constant per component
    # and equal to the component minimum (doubling is then a no-op too),
    # i.e. CONVERGED. Both sums ride the single per-iteration parquet
    # write via Observation (the hopped frame is inside the written
    # plan, so its observation fires in the same job). Non-numeric id
    # columns fall back to a join-based changed check.
    numeric = isinstance(
        labels.schema["comp"].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    )
    prev_final_sum = None
    converged = False
    i = 0
    while max_iter is None or i < max_iter:
        # 1) min-label propagation: push every vertex's current label to
        #    its neighbors; keep the min.
        prop = edges.join(labels, edges["src"] == labels["v"]).select(
            F.col("dst").alias("v"), F.col("comp").alias("comp")
        )
        hopped = (
            labels.unionByName(prop).groupBy("v").agg(F.min("comp").alias("comp"))
        )
        if numeric:
            from pyspark.sql import Observation

            obs_hop = Observation()
            hopped = hopped.observe(
                obs_hop, F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
            )
        # 2) pointer doubling: comp := min(comp, comp[comp]). Every comp
        #    value is itself a vertex id (min over vertex ids), so the
        #    self-join on comp == v always matches — inner join is exact.
        l2 = hopped.select(
            F.col("v").alias("pv"), F.col("comp").alias("pcomp")
        )
        new_labels = (
            hopped.join(l2, hopped["comp"] == l2["pv"])
            .select("v", F.least("comp", "pcomp").alias("comp"))
        )
        lp = _os.path.join(scratch, f"labels_{i}")
        if numeric:
            obs_fin = Observation()
            new_labels = new_labels.observe(
                obs_fin, F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
            )
            new_labels.write.mode("overwrite").parquet(lp)
            hop_sum = obs_hop.get["s"]
            changed = prev_final_sum is None or hop_sum != prev_final_sum
            prev_final_sum = obs_fin.get["s"]
            new_labels = spark.read.parquet(lp)
        else:
            new_labels.write.mode("overwrite").parquet(lp)
            new_labels = spark.read.parquet(lp)
            # new == old ⇒ hopped == old (monotone: new ≤ hopped ≤ old
            # pointwise) ⇒ converged
            changed = bool(
                new_labels.alias("n")
                .join(labels.alias("o"), "v")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .limit(1)
                .count()
            )
        labels = new_labels
        # the superseded iteration dir is no longer referenced (labels
        # now reads labels_{i}) — drop it so long runs don't accumulate
        # O(iterations) scratch (edges/ stays live until exit).
        if i > 0:
            _shutil.rmtree(
                _os.path.join(scratch, f"labels_{i - 1}"), ignore_errors=True
            )
        i += 1
        if not changed:
            converged = True
            break
    if stats is not None:
        stats["iterations"] = i
        stats["converged"] = converged
        stats["mode"] = "distributed"
    return labels


def dedup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Cluster-level near-dup verdict per document: MinHash-LSH pairs →
    connected components → one canonical doc (smallest id) per cluster.
    Docs in no pair are their own singleton cluster. Returns
    (doc_id, component, is_canonical:int) — filter is_canonical=1 to get
    the deduplicated corpus."""
    pairs = minhash_lsh_pairs(docs, id_col, text_col, n, threshold)
    comp = connected_components(pairs).withColumnRenamed("v", "doc_id")
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("comp", F.col("doc_id")).alias("component"),
        )
        .withColumn(
            "is_canonical", (F.col("doc_id") == F.col("component")).cast("int")
        )
    )


def dedup_keep_best(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Canonical-document selection — the step after clustering in a
    training-data dedup pipeline: instead of keeping the smallest id per
    near-dup cluster (``dedup_clusters``), keep the HIGHEST-QUALITY
    member (``functions.text.quality_score``; ties → smallest id), so
    the surviving corpus is the best copy of each duplicated document,
    not an arbitrary one. The reference keeps whichever URL it crawled
    first (crawler/frontier.py seen-set semantics); a training pipeline
    wants the best-quality representative instead.

    Scale: winner-per-cluster is a map-side-partial ``min`` aggregate of
    ``struct(-quality, doc_id)`` — NOT a window sort — so a degenerate
    boilerplate cluster with 10^8 members costs one partial-aggregated
    shuffle key, never a single-partition sort. The join back to mark
    keep=1 is component-keyed (hash join; AQE handles the one hot
    component).

    Returns (doc_id, component, quality, keep:int).
    """
    from crawlspark.functions.text import quality_score

    clusters = _persist(
        dedup_clusters(docs, id_col, text_col, n, threshold).select(
            "doc_id", "component"
        )
    )
    scored = clusters.join(
        docs.select(
            F.col(id_col).alias("doc_id"),
            quality_score(F.col(text_col)).alias("quality"),
        ),
        "doc_id",
    )
    winners = scored.groupBy("component").agg(
        F.min(F.struct((-F.col("quality")).alias("nq"), F.col("doc_id"))).alias("w")
    ).select("component", F.col("w.doc_id").alias("best_id"))
    return (
        scored.join(winners, "component")
        .select(
            "doc_id",
            "component",
            "quality",
            (F.col("doc_id") == F.col("best_id")).cast("int").alias("keep"),
        )
    )


def semdedup(
    corpus: DataFrame,
    anchors=None,
    n_cells: int = 16,
    eps: float = 0.96,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "join",
    dim: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    k-means-style clustering + within-cluster cosine pruning. The insight
    that makes it tractable at 10^10 docs: near-identical embeddings land
    in the SAME cluster, so the quadratic pair search shrinks from O(N^2)
    to sum(n_i^2) over cells — with n_cells grown ∝ N (constant cell
    size) the total work is linear and the only wide op is one shuffle
    on the cell id.

    Plan shape: cell assignment = ``ivf_assign`` (one Arrow GEMM pass,
    the same coarse quantizer the IVF ANN index uses — at production
    scale the two share trained anchors AND the cell-partitioned
    layout); within-cell pairs = a hash self-join on ``cell`` with the
    JVM-side zip_with/aggregate cosine, never a crossJoin node.

    Keep policy (deterministic): a vector is dropped iff some
    SMALLER-id vector in its cell has cosine >= ``eps`` with it;
    ``dup_of`` records the smallest such id. Greedy-by-id is the policy
    open SemDeDup implementations use in place of the paper's
    distance-to-centroid tie-break, and it is exactly SQL-expressible —
    the DuckDB twin reproduces the output bit-for-bit (cosines rounded
    to 6 dp before the threshold on both engines).

    Default ``anchors=None`` synthesizes the crc32-seeded deterministic
    anchors (oracle-exact); pass ``train_ivf_kmeans_distributed``
    centroids in production for balanced cells. ``method="join"``
    (default) prunes via the SQL-twinnable hash self-join;
    ``method="gemm"`` runs one numpy cosine matrix per cell
    (applyInPandas) — the production kernel, row-identical on real data
    (gated in tests).

    Output: (vec_id, cell, kept, dup_of) — one row per corpus vector.
    """
    from crawlspark.operators.similarity import _cosine, ivf_anchors, ivf_assign

    if method not in ("join", "gemm"):  # validate before touching caches
        raise ValueError(f"unknown method {method!r}")
    if anchors is None:
        # take the dim from the caller when given (zero extra jobs);
        # probe one row only when neither anchors nor dim are supplied
        # (VERDICT r4 #6)
        if dim is None:
            dim = len(corpus.select(vec_col).first()[0])
        anchors = ivf_anchors(dim, n_cells)
    ca = ivf_assign(corpus, anchors, nprobe=1, id_col=id_col, vec_col=vec_col).select(
        "vec_id", "cell"
    )
    v = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    # persist the assignment+vector frame: it feeds BOTH sides of the
    # cell self-join and the final left join — without the cache one
    # action re-runs the Arrow GEMM assignment pass and the corpus scan
    # three times (released via release_caches on the next entry call)
    release_caches()
    a = _persist(ca.join(v, "vec_id"))
    ca = a.select("vec_id", "cell")
    if method == "gemm":
        dup = _semdedup_cells_gemm(a, corpus.schema[id_col].dataType, eps)
    else:
        dup = _semdedup_cells_join(a, eps)
    return (
        ca.join(dup, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.col("dup_of").isNull().alias("kept"),
            "dup_of",
        )
    )


def _semdedup_cells_join(a: DataFrame, eps: float) -> DataFrame:
    """Within-cell keep-lowest-id pruning as a hash self-join on the
    cell id with the JVM-side zip_with/aggregate cosine — the
    oracle-auditable path (every op has an exact SQL twin)."""
    from crawlspark.operators.similarity import _cosine

    b = a.select(
        F.col("vec_id").alias("b_id"), F.col("cell"), F.col("v").alias("bv")
    )
    return (
        a.join(b, "cell")
        .filter(F.col("b_id") < F.col("vec_id"))
        .withColumn("cos", F.round(_cosine(F.col("v"), F.col("bv")), 6))
        .filter(F.col("cos") >= F.lit(eps))
        .groupBy("vec_id")
        .agg(F.min("b_id").alias("dup_of"))
    )


def _semdedup_cells_gemm(a: DataFrame, id_type, eps: float) -> DataFrame:
    """Within-cell pruning as ONE numpy cosine matrix per cell
    (applyInPandas) — the production kernel: a 10^4-vector cell is a
    single BLAS matmul instead of 10^8 interpreted zip_with cosines.
    Output is row-identical to the join path up to last-ulp rounding
    boundaries (asserted on real data in tests); cells are
    constant-size by design (cells ∝ N), so the n_i^2 sub-matrix is
    memory-bounded — block the matmul per cell if cells are ever
    allowed to grow past memory."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", id_type),
            T.StructField("dup_of", id_type),
        ]
    )

    def cell_prune(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = np.stack(pdf["v"].to_numpy()[order]).astype(np.float64)
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        nrm[nrm == 0.0] = np.inf
        m = m / nrm
        cos = np.round(m @ m.T, 6)
        tri = np.tril(cos >= eps, k=-1)  # strictly-smaller ids after sort
        hit = np.where(tri.any(axis=1))[0]
        if not hit.size:
            return pd.DataFrame({"vec_id": ids[:0], "dup_of": ids[:0]})
        first = tri[hit].argmax(axis=1)  # first True = smallest id
        return pd.DataFrame({"vec_id": ids[hit], "dup_of": ids[first]})

    return a.groupBy("cell").applyInPandas(cell_prune, schema)


def _rolling_span_hashes(base: DataFrame, L: int) -> DataFrame:
    """(doc_id, pos, h) for every stride-1 L-token span, h = polynomial
    rolling hash mod 2^64 of the span's JVM-computed xxhash64 token
    hashes — vectorized numpy, no span strings. B is odd, hence
    invertible mod 2^64: with P[k] = sum_{i<k} t_i * Binv^i and
    W[p] = (P[p+L] - P[p]) * B^(p+L-1), W[p] equals
    sum_{j} t_{p+j} * B^(L-1-j) — the classic Rabin-Karp window hash —
    computed for ALL positions from two cumulative arrays."""
    import numpy as np
    import pandas as pd

    id_type = dict(base.dtypes)["doc_id"]
    th = base.filter(F.col("n_tokens") >= L).select(
        "doc_id",
        F.transform(F.col("toks"), lambda t: F.xxhash64(t)).alias("th"),
    )

    B = np.uint64(0x9E3779B97F4A7C15)  # odd => invertible mod 2^64
    BINV = np.uint64(pow(int(B), -1, 1 << 64))

    def gen(batches):
        for pdf in batches:
            ids, poss, hs = [], [], []
            for doc_id, tok_hashes in zip(pdf["doc_id"], pdf["th"]):
                t = np.asarray(tok_hashes, dtype=np.int64).view(np.uint64)
                n = t.shape[0]
                m = n - L + 1
                if m <= 0:
                    continue
                with np.errstate(over="ignore"):
                    bpow = np.empty(n, dtype=np.uint64)
                    binv = np.empty(n, dtype=np.uint64)
                    bpow[0] = binv[0] = np.uint64(1)
                    np.cumprod(np.full(n - 1, B, dtype=np.uint64), out=bpow[1:])
                    np.cumprod(np.full(n - 1, BINV, dtype=np.uint64), out=binv[1:])
                    pref = np.zeros(n + 1, dtype=np.uint64)
                    np.cumsum(t * binv, out=pref[1:])
                    w = (pref[L:] - pref[:m]) * bpow[L - 1 :]
                # plain-python repeat keeps arbitrary id types intact
                # (string URL keys as well as longs)
                ids.extend([doc_id] * m)
                poss.append(np.arange(m, dtype=np.int32))
                hs.append(w.view(np.int64))
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(ids),
                        "pos": np.concatenate(poss),
                        "h": np.concatenate(hs),
                    }
                )

    return th.mapInPandas(gen, schema=f"doc_id {id_type}, pos int, h long")


def substring_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_len: int = 20,
    hasher: str = "md5",
) -> DataFrame:
    """Exact-substring deduplication (Lee et al. 2021, arXiv:2107.06499
    "Deduplicating Training Data Makes Language Models Better"): remove
    every duplicated token span of length >= ``min_len`` from all but
    its first occurrence, keeping the rest of each document intact.
    The paper builds a corpus-wide suffix array; the Spark-first
    equivalent is overlapping stride-1 ``min_len``-token windows — a
    span duplicated at ANY alignment collides window-for-window, so the
    detected+merged regions equal the suffix-array answer for matches
    of length >= min_len (each engine hashes the joined span text; a
    production variant would swap in a Rabin-Karp rolling hash inside
    mapInPandas to skip materializing span strings).

    Unlike ``passage_dedup`` (non-overlapping chunks — a duplicate
    shifted by one word is invisible), this catches duplicates at any
    offset and removes ONLY the duplicated region, not the enclosing
    passage.

    ``hasher`` picks the span fingerprint:
      - ``"md5"`` (default): md5 of the joined span text — shared with
        the DuckDB twin, so the driver query is fully value-hash
        oracled. Costs materializing an ~L-token string per position
        (~100x byte amplification on the exploded frame).
      - ``"rolling"``: the production scale path. Token hashes come
        from JVM-side ``xxhash64`` (codegen, no Python), and a
        vectorized numpy pass turns them into polynomial rolling
        hashes mod 2^64 via the modular-inverse prefix trick
        (B odd => invertible mod 2^64): P[k] = sum t_i * Binv^i,
        W[p] = (P[p+L] - P[p]) * B^(p+L-1) — one O(n) Arrow batch per
        partition, NO span strings ever built. Output is identical to
        md5 up to 64-bit hash collisions (~2^-64 per span pair;
        equivalence on real data asserted in tests). Use this at
        corpus scale; use md5 when cross-engine auditability matters.

    Pipeline (all shuffles keyed, no window over a skewed partition):
      1. explode stride-1 spans: ~n_tokens rows, md5 per span;
      2. keep-first: one hash aggregate min(struct(doc_id, pos)) per
         span hash (map-side partial — a boilerplate span in 10^8 docs
         is one aggregate cell) + an equi-join back on the hash (AQE
         splits the hot-key side);
      3. non-first occurrences become [pos, pos+min_len) intervals;
         gaps-and-islands merge per doc (window over doc_id, bounded by
         doc length);
      4. rebuild: filter the token array against the merged intervals —
         one JVM-side higher-order function, no second explode.

    Returns (doc_id, n_tokens, n_dup_spans, n_removed, clean_text), one
    row per input document. Deterministic → full DuckDB value-hash twin.
    """
    from pyspark.sql import Window

    L = int(min_len)
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
        F.size(toks).alias("n_tokens"),
    )
    if hasher == "md5":
        spans = F.transform(
            F.sequence(F.lit(0), F.col("n_tokens") - L),
            lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i + 1, L))),
        )
        occ = (
            base.filter(F.col("n_tokens") >= L)
            .select("doc_id", F.posexplode(spans).alias("pos", "h"))
        )
    elif hasher == "rolling":
        occ = _rolling_span_hashes(base, L)
    else:
        raise ValueError(f"unknown hasher {hasher!r}")
    keeper = occ.groupBy("h").agg(F.min(F.struct("doc_id", "pos")).alias("k"))
    dup = (
        occ.join(keeper, "h")
        .filter(
            ~(
                (F.col("doc_id") == F.col("k.doc_id"))
                & (F.col("pos") == F.col("k.pos"))
            )
        )
        .select("doc_id", "pos", (F.col("pos") + L).alias("e"))
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    isl = dup.withColumn(
        "new_isl",
        F.when(prev_e.isNull() | (F.col("pos") > prev_e), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn(
        "isl", F.sum("new_isl").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    merged = isl.groupBy("doc_id", "isl").agg(
        F.min("pos").alias("s"), F.max("e").alias("e")
    )
    per_doc = merged.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s")).alias("n_removed"),
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias("ivs"),
    )
    kept_idx = F.filter(
        F.when(
            F.col("n_tokens") > 0,
            F.sequence(F.lit(0), F.col("n_tokens") - 1),
        ).otherwise(F.array().cast("array<int>")),
        lambda i: F.col("ivs").isNull()
        | ~F.exists(
            F.col("ivs"), lambda v: (i >= v["s"]) & (i < v["e"])
        ),
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
            F.concat_ws(
                " ",
                F.transform(kept_idx, lambda i: F.element_at("toks", i + 1)),
            ).alias("clean_text"),
        )
    )
