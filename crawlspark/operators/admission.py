"""Admission — the vectorized ``Frontier.add_url`` (SURVEY.md §3 E2).

Reference stage order (crawler/frontier.py:114-155), reproduced
set-at-a-time per micro-batch:

  normalize (P4) → defragment (P5) → hash (P6) → seen-check (F11,
  anti-join) → new-domain robots+sitemap fetch (S6/S7) → subdomain
  aggregate (D5, derivable from frontier rows) → robots gate (F6) →
  persist + enqueue (discovery_seq assignment).

Validation (``is_valid``, scraper.py:78-120) applies to scraped links and
sitemap URLs only — the reference admits seeds (frontier.py:60-67) and
redirect targets (worker.py:89-96) WITHOUT is_valid, and we reproduce
that: `src` ∈ {seed, redirect} skips F2/F3/trap (F1 still required to key
the row).

Robots-blocked URLs are kept as frontier rows with status
'robots_blocked' instead of the reference's behavior of never persisting
them (frontier.py:148-151): with immutable per-domain rules the effect is
identical (re-discovery would be re-blocked), the subdomain report still
sees them (ref adds to `subdomains` BEFORE the gate, frontier.py:143-146),
and the seen anti-join stays one table.

Candidate input schema:
  raw_url, depth, src('seed'|'link'|'redirect'|'sitemap'),
  parent_seq (long), link_pos (int), sub_pos (int)
Ordering within a batch (the FIFO enqueue order the reference would have
produced): (parent_seq, link_pos, sub_pos) — all data-derived, stable
across parallelism levels (SURVEY.md §4.3.4).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawlspark.config import BLOCKED_EXT_REGEX, CrawlConfig
from crawlspark.functions import traps
from crawlspark.functions import urls as U
from crawlspark.operators import robots as R

CANDIDATE_COLS = ["raw_url", "depth", "src", "parent_seq", "link_pos", "sub_pos"]


def with_url_keys(df: DataFrame, url_col: str = "raw_url") -> DataFrame:
    """Canonicalize + key columns for any URL-bearing frame."""
    canon = U.canonicalize(F.col(url_col))
    return (
        df.withColumn("url", canon)
        .withColumn("url_hash", U.url_hash64(F.col("url")))
        .withColumn("url_sha", U.url_sha256(F.col("url")))
        .withColumn("host", U.hostname(F.col("url")))
        .withColumn("registered_domain", U.registered_domain(F.col("host"), is_host=True))
        .withColumn("path", U.path(F.col("url")))
    )


def validate(cands: DataFrame, config: CrawlConfig) -> DataFrame:
    """F1-F3 + trap (scraper.py:78-120) on the RAW link url (the reference
    matches its allowlist/extension regexes against the pre-normalize
    string, scraper.py:101/:111). Seeds/redirects: F1 only."""
    raw = F.col("raw_url")
    f1 = (U.scheme(raw) != "") & (U.hostname(raw) != "")
    allow = F.lit(False)
    for pat in config.allowed_url_patterns:
        allow = allow | raw.rlike("^(" + pat + ")")
    f3 = ~F.lower(raw).rlike("^(" + BLOCKED_EXT_REGEX + ")")
    needs_full = F.col("src").isin("link", "sitemap")
    ok = F.when(
        needs_full, f1 & allow & f3 & ~traps.is_trap(raw)
    ).otherwise(f1)
    return cands.filter(ok)



def assign_seq(df: DataFrame, order_cols: list[str], start: int, materialize=None) -> "DataFrame":
    """Scalable deterministic sequence assignment: global ``row_number``
    over a total data-derived order WITHOUT a single-partition window.

    Two phases (the classic parallel zipWithIndex, but order-by-key so the
    result is independent of physical partitioning): range-repartition on
    the order key, rank within each partition, then add per-partition
    offsets (one tiny collect). The order key must be unique — here
    (parent_seq, link_pos, sub_pos) is unique by construction."""
    from pyspark.sql import Window

    cols = [F.col(c) for c in order_cols]
    d = df.repartitionByRange(*cols).withColumn("_pid", F.spark_partition_id())
    local = F.row_number().over(
        Window.partitionBy("_pid").orderBy(*cols)
    )
    d = d.withColumn("_rn", local)
    if materialize is not None:
        # pin (_pid, _rn) before the counts collect: repartitionByRange
        # re-samples boundaries per evaluation, so the ranked frame must
        # not be recomputed between the offsets job and the final write
        d = materialize(d, "seq_ranked")
    counts = {r["_pid"]: r["cnt"] for r in d.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if offsets:
        mapping = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )
        off = F.element_at(mapping, F.col("_pid"))
    else:
        off = F.lit(0)
    return d.withColumn(
        "discovery_seq", (F.lit(start) + off + F.col("_rn") - 1).cast("long")
    ).drop("_pid", "_rn")


@dataclass
class AdmissionResult:
    new_rows: DataFrame        # frontier rows: status 'pending' | 'robots_blocked'
    new_rules: DataFrame | None  # robots rules discovered this batch (or None)


def admit(
    spark,
    candidates: DataFrame,
    materialize,
    seen_keys: DataFrame,          # (url_hash) of every frontier row
    rules: DataFrame,              # robots rules table (registered_domain, rule_type, value)
    robots_bodies: DataFrame,      # corpus robots (registered_domain, body) — the "web"
    sitemap_xml: DataFrame,        # corpus sitemaps (registered_domain, url, xml)
    config: CrawlConfig,
    next_seq: int,
    round_no: int,
    bloom=None,                    # BloomSeenFilter | None
    bloom_state: DataFrame | None = None,
) -> AdmissionResult:
    """One admission pass, with the new-domain robots/sitemap expansion
    fix-pointed (<=3 iterations; sitemap URLs are same-domain in practice,
    so pass 2 terminates)."""
    all_new_rows: DataFrame | None = None
    all_new_rules: DataFrame | None = None
    batch = candidates
    seq = next_seq

    for _ in range(3):
        if batch.isEmpty():
            break
        keyed = with_url_keys(validate(batch, config))
        # batch-dedup: first occurrence (reference admission order) wins
        w = Window.partitionBy("url_hash").orderBy("parent_seq", "link_pos", "sub_pos")
        deduped = (
            keyed.withColumn("_occ", F.row_number().over(w))
            .filter(F.col("_occ") == 1)
            .drop("_occ")
        )
        # seen-check (F11): optional bloom pre-filter (SURVEY §2.5 —
        # probabilistic reject is an optimization; negatives are definitely
        # fresh and skip the exact join, positives are confirmed exactly,
        # so the seen-set semantics stay identical to the plain anti-join)
        if bloom is not None and bloom_state is not None:
            probed = bloom.probe(deduped, bloom_state)
            fresh_neg = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
            maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
            fresh = fresh_neg.unionByName(maybe.join(seen_keys, "url_hash", "left_anti"))
        else:
            fresh = deduped.join(seen_keys, "url_hash", "left_anti")
        if all_new_rows is not None:
            fresh = fresh.join(
                all_new_rows.select("url_hash"), "url_hash", "left_anti"
            )
        fresh = materialize(fresh, "adm_fresh")
        n_fresh = fresh.count()
        if n_fresh == 0:
            break

        # new-domain discovery: fetch robots for domains without rules
        known = rules.select("registered_domain").distinct()
        if all_new_rules is not None:
            known = known.union(all_new_rules.select("registered_domain")).distinct()
        new_doms = (
            fresh.select("registered_domain")
            .distinct()
            .join(known, "registered_domain", "left_anti")
        )
        new_rules = materialize(
            R.parse_robots(
                new_doms.join(robots_bodies, "registered_domain"), config.user_agent
            ),
            "adm_rules",
        )
        no_new_rules = new_rules.isEmpty()
        all_new_rules = (
            new_rules if all_new_rules is None else all_new_rules.union(new_rules)
        )

        # robots gate against (existing ∪ new) rules
        eff_rules = rules.union(all_new_rules) if all_new_rules is not None else rules
        gated = R.robots_gate(fresh, eff_rules, "path")

        # assign discovery_seq in admission order. Batch-size switch: a
        # global row_number (single-partition sort) is fastest below
        # ~200k candidates/round; above that, assign_seq's two-phase
        # range-rank keeps the sort parallel (both produce the identical
        # sequence — the order key is data-derived and unique, so the
        # result is independent of partitioning; the parallelism-
        # invariance test runs with the two-phase path forced on).
        seq_threshold = int(config.extra.get("seq_two_phase_threshold", 200_000))
        if n_fresh > seq_threshold:
            rows = assign_seq(
                gated, ["parent_seq", "link_pos", "sub_pos"], seq, materialize
            )
        else:
            w_seq = Window.orderBy("parent_seq", "link_pos", "sub_pos")
            rows = gated.withColumn(
                "discovery_seq",
                (F.lit(seq) + F.row_number().over(w_seq) - 1).cast("long"),
            )
        rows = rows.withColumn(
            "status",
            F.when(F.col("robots_allowed"), F.lit("pending")).otherwise(
                F.lit("robots_blocked")
            ),
        ).withColumn("discovered_round", F.lit(round_no))
        rows = rows.select(
            "url", "url_hash", "url_sha", "host", "registered_domain", "path",
            "depth", "src", "discovery_seq", "discovered_round", "status",
)
        rows = materialize(rows, "adm_rows")
        n = rows.count()
        seq += n
        all_new_rows = rows if all_new_rows is None else all_new_rows.union(rows)

        # sitemap expansion for the new domains (S7): locs become a new
        # candidate batch ordered AFTER everything admitted so far, in
        # (domain lexicographic, loc position) order — fully data-derived
        # so the seq assignment is stable across parallelism levels.
        # No newly-discovered robots → no Sitemap lines → skip the pass
        # (a domain without robots.txt has nothing to expand, matching the
        # reference's get_sitemap_urls_from_robots_txt contract).
        if no_new_rules:
            break
        locs = R.parse_sitemaps(new_doms.join(sitemap_xml, "registered_domain"))
        dom_rank = F.dense_rank().over(Window.orderBy("registered_domain"))
        batch = locs.withColumn("dom_rank", dom_rank).select(
            F.col("loc").alias("raw_url"),
            F.lit(0).alias("depth"),
            F.lit("sitemap").alias("src"),
            (F.lit(seq) + F.col("dom_rank")).cast("long").alias("parent_seq"),
            F.lit(0).alias("link_pos"),
            F.col("loc_pos").alias("sub_pos"),
        )

    return AdmissionResult(new_rows=all_new_rows, new_rules=all_new_rules)
