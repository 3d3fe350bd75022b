"""Politeness scheduling — window-ranked micro-batches (SURVEY.md §2.9).

The reference serializes all workers behind one lock and spaces fetches
per domain by ``politeness_delay`` (crawler/frontier.py:92-110). In the
batch engine one crawl round == one politeness tick: schedule at most K
URLs per registered domain per round (K=1 reproduces the reference), FIFO
within a domain by ``discovery_seq`` (the admission-order total sequence,
which IS the reference's per-domain Queue order).

Skew note (north_rule): ranking partitions by registered_domain. A hot
domain holds millions of pending rows at 10^10 scale, but the window only
needs the TOP-K per domain — we pre-filter with a cheap per-partition
top-K (groupBy + min_by style) before the exact window, so the shuffle
carries O(K · #domains) rows, not the whole frontier. Wall-clock
politeness = driver pacing between rounds (logical in benchmarks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SALT_BUCKETS = 8  # phase-1 salt fan-out for hot registered domains


def schedule_round(
    pending: DataFrame, quota_per_domain: int = 1,
    key_col: str = "registered_domain",
    order_col: str | None = None,
) -> DataFrame:
    """Pick the next micro-batch: K lowest-seq pending URLs per politeness
    key (``key_col``: registered_domain, or host for netloc politeness —
    the reference keys its queues on netloc, frontier.py:42). Returns the
    scheduled rows (all frontier columns).

    ``order_col`` (opt-in) overrides pure FIFO: rows are ranked by
    (order_col asc, discovery_seq asc) within each politeness key, so a
    frontier that carries a priority column — negated PageRank mass
    (operators/linkgraph.py) or a recrawl due-time
    (recrawl_priority) merged in via merge_upsert — schedules its most
    urgent URLs first while the per-domain quota and deterministic
    tie-break are unchanged. Default (None) preserves the reference's
    FIFO ordering exactly.

    Two-phase top-K: (1) map-side partial — per shuffle partition keep at
    most K rows per domain via a partition-local window after a
    repartition-free aggregation pushdown; Catalyst already does partial
    aggregation for min(), so we implement phase 1 as a min-seq semi-filter
    when K == 1 (the common case), falling back to one exact window.
    """
    if order_col is not None:
        # priority scheduling: salted two-phase exact top-K under the
        # composite order (same skew math as the K>1 FIFO path — phase 1
        # can never drop a row that is in its domain's true top-K)
        order = [F.col(order_col).asc(), F.col("discovery_seq").asc()]
        salt = F.pmod(F.col("url_hash"), F.lit(SALT_BUCKETS))
        w1 = Window.partitionBy(key_col, salt).orderBy(*order)
        survivors = (
            pending.withColumn("_rn1", F.row_number().over(w1))
            .filter(F.col("_rn1") <= quota_per_domain)
            .drop("_rn1")
        )
        w2 = Window.partitionBy(key_col).orderBy(*order)
        return (
            survivors.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") <= quota_per_domain)
            .drop("_rn")
        )
    if quota_per_domain == 1:
        # K=1: per-domain min(seq) is a hash aggregate (map-side partial →
        # tiny shuffle), then a semi-join back — no full-frontier window.
        # NO forced broadcast: `heads` is one row per domain, which at the
        # north_rule's 10^8+ domains is a multi-GB build side. AQE picks
        # broadcast when heads is actually small and a shuffled hash join
        # otherwise (skew-split if a salted key ever funnels).
        heads = pending.groupBy(key_col).agg(
            F.min("discovery_seq").alias("discovery_seq")
        )
        return pending.join(heads, [key_col, "discovery_seq"], "left_semi")
    # K>1: salted two-phase top-K (north_rule hot-domain skew handling).
    # Phase 1 ranks within (domain, salt) — the hot domain's pending rows
    # split across SALT_BUCKETS partitions instead of one — keeping at
    # most K per salt; phase 2 takes the exact top-K over the <= K·S
    # survivors per domain. Salt is data-derived (url_hash), so the result
    # is identical at any parallelism level, and equals the unsalted
    # window by construction (phase 1 never drops a global top-K row:
    # a row in the domain top-K is in its salt's top-K).
    salt = F.pmod(F.col("url_hash"), F.lit(SALT_BUCKETS))
    w1 = Window.partitionBy(key_col, salt).orderBy(F.col("discovery_seq").asc())
    survivors = (
        pending.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= quota_per_domain)
        .drop("_rn1")
    )
    w2 = Window.partitionBy(key_col).orderBy(F.col("discovery_seq").asc())
    return (
        survivors.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= quota_per_domain)
        .drop("_rn")
    )


def tail_key_rows(spark, path: str, key_col: str = "registered_domain") -> dict[str, int]:
    """Per-file row count of each data file's MAXIMUM politeness-key
    value, for the sorted compacted pending layout. One distributed
    aggregate (map-side partial → O(#files·keys-per-file) shuffle rows,
    O(#files) collected) run once per COMPACTION — it removes the heads
    scheduler's only conservatism: after a mixed file, the walker knows
    exactly how many of the tail key's head rows it already kept, so
    pure-continuation files prune immediately instead of one file late.
    Keys are data-file basenames (task-UUID parquet names, unique)."""
    from pyspark.sql import Window as _W

    per = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("_f"), F.col(key_col).alias("_k"))
        .groupBy("_f", "_k")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    tails = (
        per.withColumn("_mk", F.max("_k").over(_W.partitionBy("_f")))
        .filter(F.col("_k") == F.col("_mk"))
        .select("_f", "_n")
        .collect()
    )
    import os as _os

    return {_os.path.basename(r["_f"]): int(r["_n"]) for r in tails}


def select_head_files(
    entries: list[dict], key_col: str = "registered_domain", budget: int = 1,
) -> tuple[list[dict], list[dict]] | None:
    """Stats-pruned frontier-heads scan planning (the north_rule's
    O(#domains)-per-tick scheduler; VERDICT r2 #1).

    ``entries`` are manifest/footer file stats for the COMPACTED pending
    layout — range-partitioned and sorted on (key_col, discovery_seq), so
    per-file (key, seq) tuple ranges are disjoint and each file carries
    tight [min, max] bounds for both columns. ``budget`` is the number of
    lowest-seq rows per key that must remain readable: tombstones appended
    since compaction can invalidate at most (rounds-since-compaction × K)
    head rows per key, so the caller passes that bound + K and the
    selected files are guaranteed to contain every key's surviving top-K.

    Rule: a file is prunable iff it is a PURE CONTINUATION — its key range
    is a single key that also ends the previous file's range (so the key's
    head lies strictly earlier) — and at least ``budget`` rows of that key
    have already been kept from earlier single-key files. Mixed files are
    always kept (they contain some key's head); files without bounds or
    row counts abort pruning entirely (return None → caller full-scans).

    Returns (kept_entries, pruned_entries)."""
    prepared = []
    for e in entries:
        b = e.get("bounds") or {}
        kb, sb = b.get(key_col), b.get("discovery_seq")
        if kb is None or sb is None or e.get("rows") is None:
            return None  # never prune blind
        prepared.append((kb[0], sb[0], kb[1], e))
    # Walk in the layout's RANGE order. The files are contiguous disjoint
    # ranges in (key, seq) TUPLE space, so (k_hi, k_lo, s_lo) is a total
    # order consistent with it: all pure-k files precede the mixed file
    # that starts at k (its range begins above their tuples), and the
    # mixed file ending at k' precedes k'-pure files. Sorting by k_lo/s_lo
    # first would be wrong: discovery_seq interleaves across keys, so a
    # mixed file's column-wise s_lo is polluted by its TAIL key's low
    # seqs and can sort the file before the pure files of its head key.
    prepared.sort(key=lambda t: (t[2], t[0], t[1]))

    kept: list[dict] = []
    pruned: list[dict] = []
    run_key = None   # key whose single-key run we are walking
    run_rows = 0     # rows of run_key confirmed kept from single-key files
    prev_hi = None
    for k_lo, _s_lo, k_hi, e in prepared:
        single = k_lo == k_hi
        if single and k_lo == prev_hi and run_key == k_lo and run_rows >= budget:
            pruned.append(e)
            prev_hi = k_hi
            continue
        kept.append(e)
        if single:
            run_rows = run_rows + e["rows"] if run_key == k_lo else e["rows"]
            run_key = k_lo
        else:
            # mixed file ending in k_hi: when the compaction recorded the
            # file's tail-key row count (tail_rows), the walker starts the
            # run with the exact head rows already kept; without it, 0 —
            # the conservative "+1 continuation file" behavior
            run_key, run_rows = k_hi, int(e.get("tail_rows") or 0)
        prev_hi = k_hi
    return kept, pruned


# ---------------------------------------------------------------------------
# adaptive recrawl scheduling (change-rate-driven revisit intervals)
# ---------------------------------------------------------------------------

def recrawl_priority(
    history: DataFrame,
    key_col: str = "url",
    ts_col: str = "ts",
    value_col: str = "content_hash",
    order_col: str | None = None,
    base_interval_hours: float = 24.0,
    smoothing: float = 0.05,
) -> DataFrame:
    """Adaptive revisit scheduling over a fetch-history table: per page,
    estimate the observed change rate (fraction of refetches whose
    ``value_col`` differed from the previous fetch) and derive the next
    revisit interval ``base / (smoothing + change_rate)`` — frequently
    changing pages are revisited often, static ones back off toward
    ``base/smoothing``. This is the freshness-driven priority the
    reference's FIFO frontier lacks (crawler/frontier.py:34-58 treats
    every URL as equally urgent forever).

    One lag window per key + one aggregation — at 10^10 URLs this is a
    single shuffle on the page key, and the output (one row per page)
    is exactly the priority column a frontier merge-upsert consumes.

    Returns (key, n_fetches, n_changes, change_rate, next_interval_hours)
    with change_rate rounded to 6 and the interval to 4 decimals.
    """
    order = [F.col(ts_col).asc()]
    if order_col:
        order.append(F.col(order_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(value_col)).over(w)
    changed = F.when(prev.isNotNull() & (F.col(value_col) != prev), 1).otherwise(0)
    agg = (
        history.withColumn("_chg", changed)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.sum("_chg").cast("long").alias("n_changes"),
        )
    )
    rate = F.round(
        F.coalesce(
            F.col("n_changes") * F.lit(1.0)
            / F.nullif(F.col("n_fetches") - F.lit(1), F.lit(0)),
            F.lit(0.0),
        ),
        6,
    )
    return agg.select(
        key_col,
        "n_fetches",
        "n_changes",
        rate.alias("change_rate"),
        F.round(
            F.lit(float(base_interval_hours)) / (F.lit(float(smoothing)) + rate),
            4,
        ).alias("next_interval_hours"),
    )
