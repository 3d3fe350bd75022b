"""The crawl engine — iterated micro-batch rounds (SURVEY.md §3 E1).

One round == one politeness tick == one DataFrame DAG:

  pending → per-domain window-rank quota (K=1 == reference) →
  pre-fetch gates in the reference's pop order (depth → low-data-similar →
  error-similar → trap; crawler/worker.py:54-79) → fetch join (the corpus
  IS the web) → status routing (worker.py:89-107) → parse + min-words +
  simhash near-dup gates (worker.py:115-137) → link/redirect discovery →
  vectorized admission (frontier.py:114-155) → state update.

State lives in five parquet-backed tables (pending / completed / bad /
fingerprints / rules), ALL maintained as O(delta) appends per round:
completed/bad/fingerprints are append-only parts, and pending is base
parts + popped-key tombstones (merge-on-read; see the ``pending``
property) compacted only at snapshot commits. An icelite snapshot is
committed every ``checkpoint_interval`` rounds (resume = load the
latest snapshot; per-partition lineage + fetch/parse metrics ride in
the manifest — the north_rule surface).

Suppression semantics bridge (frozen; SURVEY.md §7 "hard parts"): the
bad-URL and simhash similarity gates evaluate against state AS OF ROUND
START — the reference's sequential loop interleaves updates mid-"round",
the batch engine can't; with K=1/domain/round the observable difference
is confined to same-round cross-domain discoveries. The conformance
oracle (crawlspark.oracle) implements the identical round semantics.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from functools import reduce
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawlspark.config import CrawlConfig
from crawlspark.functions import traps
from crawlspark.functions import urls as U
from crawlspark.icelite import IceliteCatalog, scan_parquet_stats
from crawlspark.operators import admission as ADM
from crawlspark.operators import badurls as BAD
from crawlspark.operators import fetch as FE
from crawlspark.operators.membership import BloomSeenFilter
from crawlspark.operators.schedule import (
    schedule_round,
    select_head_files,
    tail_key_rows,
)

FRONTIER_FIELDS = [
    ("url", T.StringType()),
    ("url_hash", T.LongType()),
    ("url_sha", T.StringType()),
    ("host", T.StringType()),
    ("registered_domain", T.StringType()),
    ("path", T.StringType()),
    ("depth", T.IntegerType()),
    ("src", T.StringType()),
    ("discovery_seq", T.LongType()),
    ("discovered_round", T.IntegerType()),
    ("status", T.StringType()),
]
COMPLETED_EXTRA = [
    ("completed_round", T.IntegerType()),
    ("total_words", T.IntegerType()),
    ("n_distinct_words", T.IntegerType()),
]
# closed set of terminal statuses: the pop-order gates in run_round plus
# every route route_verdict emits (operators/fetch.py:113-135); used by
# the Observation-based per-status counts, cross-checked against _total
STATUS_VALUES = (
    "depth_skip",
    "lowdata_similar_skip",
    "error_similar_skip",
    "trap_skip",
    "neardup",
    "parsed",
    "fetch_error",
    "redirect",
    "error",
    "empty",
    "skipped_large",
    "skipped_type",
    "low_data",
)


def _schema(fields) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


def _pq_rows(path: str) -> int | None:
    """Row count from local parquet footers — zero Spark jobs. Returns
    None when the path isn't a local readable parquet dir (cluster
    storage → caller falls back to df.count())."""
    import pyarrow.parquet as pq

    if not os.path.isdir(path):
        return None
    total = 0
    try:
        for dirpath, _, fnames in os.walk(path):
            for fn in fnames:
                if fn.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(dirpath, fn)).metadata.num_rows
    except Exception:
        return None
    return total


def fast_count(df: DataFrame) -> int:
    """Count a frame returned by the engine's materializers without a
    Spark job (parquet footer metadata); any other frame falls back to
    a normal count(). Shaves ~4 driver round-trips per crawl round."""
    path = getattr(df, "_crawlspark_path", None)
    if path is not None:
        n = _pq_rows(path)
        if n is not None:
            return n
    return df.count()


FRONTIER_SCHEMA = _schema(FRONTIER_FIELDS)
COMPLETED_SCHEMA = _schema(FRONTIER_FIELDS + COMPLETED_EXTRA)
BAD_SCHEMA = _schema(
    [
        ("url", T.StringType()),
        ("host", T.StringType()),
        ("kind", T.StringType()),
        ("sim_tokens", T.ArrayType(T.StringType())),
    ]
)
FP_SCHEMA = _schema([("url_hash", T.LongType()), ("simhash", T.LongType())])
RULES_SCHEMA = _schema(
    [
        ("registered_domain", T.StringType()),
        ("rule_type", T.StringType()),
        ("value", T.StringType()),
        ("rule_pos", T.IntegerType()),
    ]
)


@dataclass
class RoundStats:
    round_no: int
    scheduled: int
    new_urls: int
    by_status: dict[str, int]
    seconds: float
    # schedule-scan telemetry (stats-pruned frontier heads): files/rows the
    # schedule actually read vs the full frontier; None = full scan ran
    sched_scan: dict | None = None


@dataclass
class CrawlStats:
    rounds: list[RoundStats] = field(default_factory=list)

    @property
    def total_scheduled(self) -> int:
        return sum(r.scheduled for r in self.rounds)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        config: CrawlConfig,
        corpus_dir: str | None,
        state_dir: str,
        checkpoint_interval: int = 5,
        pace_wallclock: bool = False,
        pages: DataFrame | None = None,
        robots_bodies: DataFrame | None = None,
        sitemap_xml: DataFrame | None = None,
    ):
        self.spark = spark
        self.config = config
        self.corpus_dir = corpus_dir
        self._pages_df = pages
        self._robots_df = robots_bodies
        self._sitemaps_df = sitemap_xml
        self.catalog = IceliteCatalog(state_dir)
        self.scratch_dir = os.path.join(state_dir, "scratch")
        os.makedirs(self.scratch_dir, exist_ok=True)
        self._state_ver: dict[str, int] = {}
        self._delta_ver: dict[str, int] = {}
        self._state_parts: dict[str, list[str]] = {}
        # delta-path allocation is shared between the round's background
        # delta writes and admission's own (concurrent) delta writes
        import threading

        self._delta_lock = threading.Lock()
        # membership pre-filter for the seen anti-join: 'bloom' (OR-merge
        # bitarrays) or 'cuckoo' (16-bit fingerprints, overflow-safe) —
        # both uphold the no-false-negative exactness contract
        filt_kind = config.extra.get(
            "seen_filter", "bloom" if config.extra.get("use_bloom") else None
        )
        if filt_kind == "bloom":
            self.bloom = BloomSeenFilter(
                n_buckets=config.frontier_buckets,
                bits_per_key=config.bloom_bits_per_key,
                expected_keys_per_bucket=int(config.extra.get("bloom_keys_per_bucket", 100_000)),
            )
        elif filt_kind == "cuckoo":
            from crawlspark.operators.membership import CuckooSeenFilter

            self.bloom = CuckooSeenFilter(
                n_buckets=config.frontier_buckets,
                expected_keys_per_bucket=int(config.extra.get("bloom_keys_per_bucket", 100_000)),
            )
        else:
            self.bloom = None
        self.bloom_state: DataFrame | None = None
        self.checkpoint_interval = checkpoint_interval
        self.pace_wallclock = pace_wallclock
        self.stats = CrawlStats()
        # grow-forever memories: once past the broadcast budget the
        # similarity joins degrade to shuffled hash joins (scale guard)
        self._n_bad_total = 0
        self._broadcast_bad_limit = int(config.extra.get("broadcast_bad_limit", 500_000))
        # forced-broadcast budget for the per-round scheduled batch (fetch
        # join + near-dup probe): O(#ready-keys) rows at K=1 — multi-GB at
        # 10^8+ domains, so past the budget those joins shuffle instead
        self._batch_broadcast_limit = int(
            config.extra.get("batch_broadcast_limit", 500_000)
        )
        # driver-side known-domain cache: lets admission answer "any new
        # domains in this batch?" with zero Spark jobs in steady state;
        # disabled (None) past the budget — the relational anti-join path
        # is the semantics either way
        self._known_doms: set | None = set()
        self._known_doms_limit = int(
            config.extra.get("known_domains_cache_limit", 1_000_000)
        )
        # politeness key (reference keys its queues + robots cache on
        # netloc, crawler/frontier.py:42/:136-141; registered_domain is the
        # stricter default that also covers subdomain-farm abuse)
        self._key_col = (
            "host" if config.extra.get("politeness_key") == "netloc"
            else "registered_domain"
        )
        # opt-in robots Crawl-delay pacing (default OFF — the reference
        # ignores the directive, and conformance schedules must stay
        # byte-identical): per-domain delay in ROUNDS derived from the
        # rules table (ceil(delay_s / politeness_delay_s)); state = one
        # tiny (key, registered_domain, last_round) table of DELAYED keys
        # only, rewritten per round via _mat_state and carried in
        # snapshots. Scale: O(#domains-with-crawl-delay) rows, the
        # blocked anti-join is AQE-guarded like the K=1 heads join.
        self._respect_crawl_delay = bool(config.extra.get("respect_crawl_delay"))
        self._delay_state: DataFrame | None = None
        self._n_delay_rules: int | None = None  # None = recount from rules
        # driver-side delay bookkeeping (VERDICT r4 #4): in-window keys
        # are a dict fed from the materialized sched batch's LOCAL column
        # read — zero per-round Spark jobs where the distributed path
        # cost a state rewrite + a blocked-keys join per round. Budgeted
        # like _known_doms: past delay_keys_budget crawl-delay rules the
        # engine falls back to the distributed state table.
        self._delay_last: dict[str, tuple[str, int]] = {}  # dkey -> (dom, last_round)
        self._delay_rounds_cache: tuple[dict | None] | None = None
        self._delay_keys_budget = int(config.extra.get("delay_keys_budget", 2_000_000))
        # opt-in per-key error circuit breaker (default OFF — same
        # conformance reasoning as Crawl-delay): extra["error_backoff"]
        # = {"threshold": E, "rounds": B} benches a politeness key for B
        # rounds after a round in which >= E of its fetches returned
        # HTTP >= 500 (server distress — page-level 4xx never trips it).
        # State = one tiny (bkey, until_round) table of TRIPPED keys,
        # rewritten per round and snapshot-carried; the pure-Python
        # oracle mirrors the rule so full fetch-order conformance holds
        # with the flag on (tests/test_backoff.py).
        eb = config.extra.get("error_backoff")
        self._backoff: tuple[int, int] | None = (
            (int(eb["threshold"]), int(eb["rounds"])) if eb else None
        )
        self._backoff_state: DataFrame | None = None
        # stats-pruned frontier-heads scheduling (north_rule 10^10 scan):
        # when the pending base is the sorted compacted layout, each round
        # reads only per-key head files (footer/manifest bounds) + deltas
        # + tombstones instead of the whole frontier
        self._heads_sched = bool(config.extra.get("heads_scheduling", True))
        # opt-in priority scheduling (the north_star's "priority queue
        # realized as window-ranked micro-batches", end-to-end in the
        # engine): extra["priority_col"] names a pending column ranked
        # ASC before discovery_seq within each politeness key — e.g.
        # "depth" schedules shallow URLs first. Default None keeps the
        # reference's pure FIFO (conformance schedules byte-identical).
        # Heads pruning assumes FIFO-by-seq file order, so priority mode
        # always scans the full frontier for scheduling.
        self._priority_col: str | None = config.extra.get("priority_col")
        if self._priority_col:
            self._heads_sched = False
        # per-key HEADS table scheduling (VERDICT r4 #3 — the many-keys
        # regime): extra["heads_mode"]="table" maintains a compact table
        # of each politeness key's B = quota × heads_refresh_rounds
        # lowest-seq pending rows, so a politeness tick reads
        # O(#keys × B) rows REGARDLESS of frontier depth or file layout.
        # The footer-stats scan path above prunes only while
        # #keys ≲ #files; at the north_rule target (10^10 URLs over 10^7
        # domains) #keys ≫ #files and its scan floor degrades back to
        # O(frontier) — the HEADS table is the shape that survives there.
        # Maintenance: admissions since the last build ride the scan as
        # delta parts; pops are anti-joined; a full rebuild (one
        # frontier pass, amortized 1/refresh per round) runs only when
        # accumulated tombstone parts could invalidate a key's whole
        # budget, or after compaction/snapshot rewrites the base.
        self._heads_mode = str(config.extra.get("heads_mode", "scan"))
        if self._priority_col:
            # heads are maintained in FIFO seq order; a priority column
            # re-ranks within keys, so table mode must full-scan
            self._heads_mode = "scan"
        if self._heads_mode == "table":
            self._heads_sched = False  # stats-scan machinery unused
        self._heads_refresh_rounds = max(
            2, int(config.extra.get("heads_refresh_rounds", 8))
        )
        self._heads_df: DataFrame | None = None
        self._heads_popped_idx = 0
        self._heads_pending_idx = 0
        self._sorted_base: str | None = None  # path of the sorted base part
        self._fstats_cache: dict[str, list[dict]] = {}
        # target rows per data file in the compacted layout — file count
        # scales with frontier size so the per-round heads scan stays
        # O(#keys × file_rows), not O(frontier)
        self._pending_file_rows = int(config.extra.get("pending_file_rows", 1_000_000))
        self._load_corpus()

    # ------------------------------------------------------------------
    def _load_corpus(self) -> None:
        s = self.spark
        if self._pages_df is not None:
            pages = self._pages_df
        elif self.corpus_dir is None:
            # live-HTTP mode (extra['fetch_mode']='http'): no corpus tables;
            # robots/sitemaps must be passed in (or stay empty)
            self.pages = None
            self.pages_bucketed = False
            self.robots_bodies = self._robots_df if self._robots_df is not None else s.createDataFrame(
                [], "registered_domain string, body string"
            )
            self.sitemap_xml = self._sitemaps_df if self._sitemaps_df is not None else s.createDataFrame(
                [], "registered_domain string, xml string"
            )
            return
        else:
            pages = s.read.parquet(f"{self.corpus_dir}/pages.parquet")
        # index the corpus once by the engine's scheme-excluded 64-bit key
        pages_keyed = pages.withColumn(
            "page_hash", U.url_hash64(U.canonicalize(F.col("canonical_url")))
        ).select(
            "page_hash", "status", "redirect_to", "content_type",
            "content_length", "caption", "out_links", "canonical_url",
        )
        self.pages_bucketed = bool(self.config.extra.get("bucket_pages"))
        if self.pages_bucketed:
            # Hash-bucketed layout (icelite-style): pages written ONCE
            # partitioned by pbucket = pmod(page_hash, frontier_buckets).
            # Each round's fetch join filters on the buckets the scheduled
            # keys actually touch → partition pruning at the scan (at 100 TB
            # this is the difference between re-reading the corpus every
            # politeness round and reading only the touched fraction).
            b = self.config.frontier_buckets
            path = os.path.join(self.catalog.root, "pages_bucketed")
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                pages_keyed.withColumn(
                    "pbucket", F.pmod(F.col("page_hash"), F.lit(b)).cast("int")
                ).write.partitionBy("pbucket").mode("overwrite").parquet(path)
            # persist: locally the pruned scan hits the cache (per-batch
            # stats pruning); on a real cluster drop the persist and the
            # same plan prunes parquet partitions
            self.pages = s.read.parquet(path).persist()
        else:
            self.pages = pages_keyed.persist()
        if self._robots_df is not None:
            self.robots_bodies = self._robots_df.persist()
        else:
            self.robots_bodies = s.read.parquet(f"{self.corpus_dir}/robots.parquet").select(
                F.col("domain").alias("registered_domain"), "body"
            ).persist()
        if self._sitemaps_df is not None:
            self.sitemap_xml = self._sitemaps_df
        else:
            sm = s.read.parquet(f"{self.corpus_dir}/sitemaps.parquet")
            cols = [F.col("domain").alias("registered_domain")]
            if "url" in sm.columns:
                # by-URL addressing enables sitemapindex recursion (S7)
                cols.append(F.col("url"))
            self.sitemap_xml = sm.select(*cols, "xml").persist()

    def _empty(self, schema: T.StructType) -> DataFrame:
        return self.spark.createDataFrame([], schema)

    # -- materialization ------------------------------------------------
    # Intermediates and state are pinned to Parquet scratch files instead
    # of localCheckpoint: plans stay flat forever, nothing accumulates in
    # the session (profiling showed in-session RDD/broadcast buildup
    # degrading driver planning 20-50x after a few rounds), and every
    # round boundary is trivially resumable — which is the icelite model
    # anyway. Scratch from two rounds ago is deleted each round.
    def _mat(self, df: DataFrame, name: str, single: bool = False) -> DataFrame:
        # repartition(1), NOT coalesce(1): coalesce collapses the upstream
        # plan to one task (a pandas UDF would run serially); repartition
        # keeps upstream parallel and only funnels the small result.
        path = os.path.join(self.scratch_dir, f"r{self.round_no:06d}", name)
        (df.repartition(1) if single else df).write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        out._crawlspark_path = path
        return out

    def _mat_state(self, df: DataFrame, name: str, single: bool = False) -> DataFrame:
        """Full-rewrite state table (pending). Versions independently of
        rounds; keeps the previous version for in-flight plans and deletes
        older ones."""
        import shutil

        ver = self._state_ver.get(name, -1) + 1
        self._state_ver[name] = ver
        path = os.path.join(self.scratch_dir, "state", name, f"v{ver:06d}")
        (df.repartition(1) if single else df).write.mode("overwrite").parquet(path)
        old = os.path.join(self.scratch_dir, "state", name, f"v{ver - 2:06d}")
        shutil.rmtree(old, ignore_errors=True)
        out = self.spark.read.parquet(path)
        out._crawlspark_path = path
        return out

    def _alloc_delta_path(self, name: str) -> str:
        """Reserve the next delta file path for a state table. Lock-
        serialized: the round's background delta writes and admission's
        own delta writes may allocate concurrently."""
        with self._delta_lock:
            dirp = os.path.join(self.scratch_dir, "state", name)
            if name not in self._delta_ver:
                # resume safety: never overwrite a delta dir a previous
                # run's manifest may reference
                self._delta_ver[name] = (
                    len(os.listdir(dirp)) if os.path.isdir(dirp) else 0
                )
            ver = self._delta_ver[name]
            self._delta_ver[name] = ver + 1
            return os.path.join(dirp, f"d{ver:06d}")

    def _append_state_delta(self, delta: DataFrame, name: str, single: bool = True) -> DataFrame:
        """Append-only state table (completed / bad / fingerprints): write
        ONLY the round's delta — O(delta) per round instead of an O(total)
        rewrite. The icelite manifest references delta files without
        rewriting them (Iceberg append-commit semantics). Returns the
        materialized delta alone; read the full table via _state_table."""
        path = self._alloc_delta_path(name)
        (delta.repartition(1) if single else delta).write.mode("overwrite").parquet(path)
        self._state_parts.setdefault(name, []).append(path)
        out = self.spark.read.parquet(path)
        out._crawlspark_path = path
        return out

    def _append_state_deltas(self, items: list[tuple[DataFrame, str, bool]]) -> None:
        """Write several INDEPENDENT state deltas concurrently — each is
        one small Spark job whose cost is mostly fixed driver/scheduler
        latency, so overlapping them turns a sum of round-trips into a
        max. Spark job submission is thread-safe; paths/versions are
        allocated serially first, and parts are registered only after
        every write succeeds (same write-then-register semantics as the
        sequential helper)."""
        self._append_state_deltas_async(items)()

    def _append_state_deltas_async(self, items: list[tuple[DataFrame, str, bool]]):
        """Kick the delta writes off in background threads and return a
        join() callable that registers the parts (or raises). Lets the
        caller overlap the writes with other driver work (run_round
        overlaps the popped/bad/fingerprints deltas with admission, which
        touches only the pending/completed tables and never reads these
        three mid-round). On failure every allocated-but-unregistered
        delta dir is removed best-effort, so no orphan parquet dirs
        accumulate in state/ (the exception still aborts the round)."""
        if not items:
            out = lambda: None
            out.paths = []
            return out
        alloc = [
            (delta.repartition(1) if single else delta, name, self._alloc_delta_path(name))
            for delta, name, single in items
        ]
        from concurrent.futures import ThreadPoolExecutor

        sc = self.spark.sparkContext

        def write(t):
            # background pool: under FAIR scheduling the overlapped
            # critical-path jobs (admission) share task slots with these
            # writes instead of FIFO-queueing behind them (pinned-thread
            # mode gives each Python thread its own JVM thread, so the
            # local property scopes to this write only)
            sc.setLocalProperty("spark.scheduler.pool", "crawlspark_bg")
            t[0].write.mode("overwrite").parquet(t[2])

        ex = ThreadPoolExecutor(max_workers=len(alloc))
        futs = [ex.submit(write, t) for t in alloc]
        ex.shutdown(wait=False)

        def join() -> None:
            err = None
            for f in futs:
                try:
                    f.result()
                except Exception as e:  # keep draining so all writes settle
                    err = err or e
            if err is not None:
                import shutil

                for _, _, path in alloc:
                    shutil.rmtree(path, ignore_errors=True)
                raise err
            for _, name, path in alloc:
                self._state_parts.setdefault(name, []).append(path)

        join.paths = [path for _, _, path in alloc]
        return join

    def _state_table(self, name: str, schema: T.StructType) -> DataFrame:
        parts = self._state_parts.get(name)
        if not parts:
            return self._empty(schema)
        return self.spark.read.parquet(*parts)

    @property
    def completed(self) -> DataFrame:
        return self._state_table("completed", COMPLETED_SCHEMA)

    @property
    def bad(self) -> DataFrame:
        return self._state_table("bad", BAD_SCHEMA)

    @property
    def fingerprints(self) -> DataFrame:
        return self._state_table("fingerprints", FP_SCHEMA)

    # -- pending frontier: base parts + popped tombstones ----------------
    # The frontier of record is append-only between snapshots: admitted
    # rows land as O(delta) parquet parts ('pending'), scheduled keys as
    # tombstone parts ('popped'), and the readable frontier is
    # base ⟕̸ tombstones (anti-join; AQE broadcasts the small tombstone
    # side). A full O(frontier) rewrite happens only at compaction —
    # snapshot commits, or when tombstone parts pile up — never per
    # round. This is Iceberg's merge-on-read delete-file model, which is
    # the only write pattern that survives a 10^10-row frontier.
    @property
    def pending(self) -> DataFrame:
        base = self._state_table("pending", FRONTIER_SCHEMA)
        tombs = self._state_parts.get("popped")
        if not tombs:
            return base
        t = self.spark.read.parquet(*tombs).select("url_hash")
        return base.join(t, "url_hash", "left_anti")

    def _pending_rows_estimate(self) -> int:
        """Upper bound on pending rows from local parquet footers (tombs
        not subtracted); 0 when footers aren't locally readable."""
        total = 0
        for p in self._state_parts.get("pending", []):
            n = _pq_rows(p)
            if n:
                total += n
        return total

    def _sorted_layout(self, df: DataFrame) -> DataFrame:
        """The compacted frontier layout: range-partitioned + sorted on
        (politeness key, discovery_seq) so every data file carries TIGHT
        footer/manifest bounds for both columns and each key's FIFO head
        lives in the first file whose key range covers it. Partition count
        scales with frontier rows (pending_file_rows per file) — the
        heads scheduler's per-round scan is then O(#keys × file_rows)
        regardless of frontier depth."""
        n = self._pending_rows_estimate()
        parts = max(
            2,
            self.spark.sparkContext.defaultParallelism,
            n // self._pending_file_rows + 1,
        )
        return df.repartitionByRange(
            parts, self._key_col, "discovery_seq"
        ).sortWithinPartitions(self._key_col, "discovery_seq")

    def _compact_pending(self, force: bool = False) -> None:
        """Fold tombstones into a single base part (O(frontier), run at
        snapshot commits / tombstone pile-up only) in the sorted layout
        (see _sorted_layout) the stats-pruned heads scheduler reads."""
        if not force and not self._state_parts.get("popped") and len(
            self._state_parts.get("pending", [])
        ) <= 1:
            return
        compacted = self._sorted_layout(self.pending)
        self._append_state_delta(compacted, "pending", single=False)
        self._state_parts["pending"] = [self._state_parts["pending"][-1]]
        self._state_parts["popped"] = []
        self._sorted_base = self._state_parts["pending"][0]
        # the parts list was rewritten — the HEADS table's delta/tombstone
        # indexes are stale; force a rebuild on the next schedule tick
        self._heads_df = None
        # superseded bases never get scheduled again — REPLACE the stats
        # cache instead of accumulating one entry per compaction forever
        self._fstats_cache = {}
        if self._heads_sched:
            # prime the stats cache with tail-key-annotated footer entries
            # so this compaction's files prune exactly from the next round
            try:
                entries = scan_parquet_stats(self._sorted_base) or None
            except Exception:
                entries = None
            if entries:
                self._annotate_tail_stats(self._sorted_base, entries)
            self._fstats_cache[self._sorted_base] = entries

    def _annotate_tail_stats(self, path: str, entries: list[dict]) -> None:
        """Attach per-file tail-key row counts (schedule.tail_key_rows) to
        freshly-compacted pending file stats — one aggregate job per
        COMPACTION, amortized over every subsequent round's head-file
        pruning (it removes select_head_files' only conservatism). Entries
        are matched by data-file basename, so relative manifest paths and
        absolute scratch paths both work."""
        if not self._heads_sched or not entries:
            return
        try:
            tails = tail_key_rows(self.spark, path, self._key_col)
        except Exception:
            return
        for e in entries:
            n = tails.get(os.path.basename(e["file"]))
            if n is not None:
                e["tail_rows"] = n

    # -- stats-pruned frontier-heads scheduling -------------------------
    def _file_stats(self, path: str) -> list[dict] | None:
        """File stats for an immutable base part, cached. When the base
        IS the latest snapshot's pending table, the entries come straight
        from the icelite MANIFEST (Iceberg's scan planning — no file
        access at all); scratch compactions between snapshots fall back
        to reading the local parquet footers (same metadata, no Spark
        job)."""
        if path not in self._fstats_cache:
            entries = None
            try:
                snap = self.catalog.latest()
                if snap is not None and self.catalog.paths(snap, "pending") == [path]:
                    fs = self.catalog.files(snap, "pending")
                    if fs:
                        entries = [
                            {**f, "file": os.path.join(self.catalog.root, f["file"])}
                            for f in fs
                        ]
            except Exception:
                entries = None
            if entries is None:
                try:
                    entries = scan_parquet_stats(path)
                except Exception:
                    entries = None
            self._fstats_cache[path] = entries
        return self._fstats_cache[path]

    def _heads_budget(self) -> int:
        return self.config.per_domain_quota * self._heads_refresh_rounds

    def _rebuild_heads(self) -> None:
        """(Re)build the HEADS table: each politeness key's B lowest-seq
        SURVIVING pending rows (one full-frontier top-B pass — the salted
        two-phase window schedule_round uses for K>1, so hot keys never
        funnel one partition). Runs at most once per refresh window and
        after any pending-base rewrite, so its O(frontier) cost is
        amortized 1/refresh per tick while every tick's scan is
        O(#keys × B)."""
        self._heads_df = self._mat_state(
            schedule_round(self.pending, self._heads_budget(), self._key_col),
            "heads",
            single=False,
        )
        self._heads_popped_idx = len(self._state_parts.get("popped", []))
        self._heads_pending_idx = len(self._state_parts.get("pending", []))

    def _heads_for_schedule(self) -> tuple[DataFrame, dict]:
        """Table-mode schedule source: HEADS ∪ admission-deltas-since-
        build, minus tombstones-since-build. Correctness: pops remove at
        most quota rows per key per popped part, so while
        (parts_since + 1) × quota ≤ B every key's surviving top-quota is
        within its B build-time heads (∪ the deltas) — past that bound
        the table is rebuilt first. A key with fewer than B rows at
        build time had ALL of them in HEADS, so drained keys terminate
        identically to the full scan."""
        popped = self._state_parts.get("popped", [])
        p_since = len(popped) - self._heads_popped_idx
        if (
            self._heads_df is None
            or (p_since + 1) * self.config.per_domain_quota > self._heads_budget()
        ):
            self._rebuild_heads()
            popped = self._state_parts.get("popped", [])
        frame = self._heads_df
        deltas = self._state_parts.get("pending", [])[self._heads_pending_idx:]
        if deltas:
            frame = frame.unionByName(
                self.spark.read.parquet(*deltas).select(*frame.columns)
            )
        tombs = popped[self._heads_popped_idx:]
        if tombs:
            t = self.spark.read.parquet(*tombs).select("url_hash")
            frame = frame.join(t, "url_hash", "left_anti")
        heads_rows = _pq_rows(getattr(self._heads_df, "_crawlspark_path", "")) or 0
        delta_rows = sum(_pq_rows(p) or 0 for p in deltas)
        scanned = heads_rows + delta_rows
        total = max(self._pending_rows_estimate(), scanned)
        telemetry = {
            "mode": "table",
            # parts, not data files, in table mode: the base parts are
            # never opened at all — every one counts as pruned
            "files_scanned": 1 + len(deltas),
            "files_pruned": self._heads_pending_idx,
            "base_rows_scanned": scanned,
            "base_rows_total": total,
        }
        return frame, telemetry

    def _pending_for_schedule(self) -> tuple[DataFrame, dict | None]:
        """The frame schedule_round scans this round. When the pending
        base is the sorted compacted layout, prune it to per-key head
        files via footer/manifest bounds (select_head_files): tombstones
        since compaction can invalidate at most K rows per key per popped
        part, so a budget of K·(popped_parts+1) rows per key keeps every
        key's surviving top-K readable. Falls back to the full frontier
        whenever the invariants don't hold. Returns (frame, telemetry).

        ``heads_mode="table"`` routes to the per-key HEADS table instead
        (O(#keys × B) per tick independent of frontier depth AND file
        count — the many-keys regime where footer pruning disengages)."""
        if self._heads_mode == "table":
            return self._heads_for_schedule()
        parts = self._state_parts.get("pending", [])
        if (
            not self._heads_sched
            or self._sorted_base is None
            or self._sorted_base not in parts
        ):
            return self.pending, None
        entries = self._file_stats(self._sorted_base)
        if not entries:
            return self.pending, None
        popped_parts = len(self._state_parts.get("popped", []))
        budget = self.config.per_domain_quota * (popped_parts + 1)
        sel = select_head_files(entries, self._key_col, budget)
        if sel is None:
            return self.pending, None
        kept, pruned = sel
        deltas = [p for p in parts if p != self._sorted_base]
        paths = [e["file"] for e in kept] + deltas
        base = self.spark.read.parquet(*paths)
        tombs = self._state_parts.get("popped")
        if tombs:
            t = self.spark.read.parquet(*tombs).select("url_hash")
            base = base.join(t, "url_hash", "left_anti")
        kept_rows = sum(e["rows"] for e in kept)
        pruned_rows = sum(e["rows"] for e in pruned)
        telemetry = {
            "files_scanned": len(kept) + len(deltas),
            "files_pruned": len(pruned),
            "base_rows_scanned": kept_rows,
            "base_rows_total": kept_rows + pruned_rows,
        }
        return base, telemetry

    # -- opt-in robots Crawl-delay pacing ------------------------------
    def _delay_rules_count(self) -> int:
        """#crawl_delay rows in the rules table, recounted lazily after
        any rules change (one tiny job; only ever runs when the feature
        flag is on)."""
        if self._n_delay_rules is None:
            self._n_delay_rules = self.rules.filter(
                F.col("rule_type") == "crawl_delay"
            ).count()
        return self._n_delay_rules

    def _delay_map(self) -> dict[str, int] | None:
        """registered_domain → delay_rounds as a driver dict, recomputed
        lazily after any rules change (one tiny collect of the delayed
        domains — O(#crawl_delay rules), the same budget class as the
        known-domains cache). None when the rule count exceeds
        ``delay_keys_budget`` → callers use the distributed state path."""
        if self._delay_rounds_cache is None:
            if self._delay_rules_count() > self._delay_keys_budget:
                self._delay_rounds_cache = (None,)
            else:
                self._delay_rounds_cache = (
                    {
                        r["registered_domain"]: int(r["delay_rounds"])
                        for r in self._delays_plan().collect()
                    },
                )
        return self._delay_rounds_cache[0]

    def _delays_plan(self) -> DataFrame:
        """(registered_domain, delay_rounds) for domains whose robots ask
        for MORE than one politeness tick between fetches:
        delay_rounds = ceil(Crawl-delay / politeness_delay_s), max across
        duplicate directives; non-numeric values are ignored. A lazy plan
        over the materialized rules state — evaluated inside the consuming
        join, never its own job."""
        tick = float(self.config.politeness_delay_s)
        return (
            self.rules.filter(F.col("rule_type") == "crawl_delay")
            .groupBy("registered_domain")
            .agg(F.max(F.col("value").cast("double")).alias("_ds"))
            .select(
                "registered_domain",
                F.greatest(F.lit(1), F.ceil(F.col("_ds") / F.lit(tick)))
                .cast("int")
                .alias("delay_rounds"),
            )
            .filter(F.col("delay_rounds") > 1)
        )

    def _blocked_keys(self) -> DataFrame | None:
        """Politeness keys excluded from this round's schedule: keys
        still inside their Crawl-delay window, and keys benched by the
        error circuit breaker (None when no feature contributes).
        O(#delayed + #tripped) rows; AQE decides the join strategy
        downstream (same guard philosophy as the K=1 heads)."""
        parts: list[DataFrame] = []
        if self._respect_crawl_delay and self._delay_rules_count() != 0:
            dmap = self._delay_map()
            if dmap is not None:
                # driver dict: prune expired windows in place, the rest
                # ARE the blocked keys — a tiny literal frame, no join
                expired = [
                    k
                    for k, (d, lr) in self._delay_last.items()
                    if self.round_no - lr >= dmap.get(d, 0)
                ]
                for k in expired:
                    del self._delay_last[k]
                if self._delay_last:
                    parts.append(
                        self.spark.createDataFrame(
                            [(k,) for k in self._delay_last],
                            f"{self._key_col} string",
                        )
                    )
            elif self._delay_state is not None:
                parts.append(
                    self._delay_state.join(self._delays_plan(), "registered_domain")
                    .filter(
                        (F.lit(self.round_no) - F.col("last_round"))
                        < F.col("delay_rounds")
                    )
                    .select(F.col("dkey").alias(self._key_col))
                )
        if self._backoff is not None and self._backoff_state is not None:
            parts.append(
                self._backoff_state.filter(
                    F.col("until_round") >= F.lit(self.round_no)
                ).select(F.col("bkey").alias(self._key_col))
            )
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _update_backoff_state(self, s: DataFrame, routed: DataFrame) -> None:
        """Trip the breaker for keys whose round had >= threshold HTTP
        >= 500 results (frozen spec; route == 'error' covers every
        non-2xx/3xx terminal). One tiny full-rewrite job per round when
        the feature is on — state is O(#tripped-keys), expired rows are
        dropped on every rewrite."""
        thresh, bench_rounds = self._backoff
        err5 = routed.filter(
            (F.col("route") == "error") & (F.col("http_status") >= 500)
        ).select("url_hash")
        newly = (
            s.join(err5, "url_hash", "left_semi")
            .groupBy(F.col(self._key_col).alias("bkey"))
            .agg(F.count("*").alias("n_err"))
            .filter(F.col("n_err") >= thresh)
            .select(
                "bkey",
                F.lit(self.round_no + bench_rounds).alias("until_round"),
            )
        )
        prev = (
            None
            if self._backoff_state is None
            else self._backoff_state.filter(
                F.col("until_round") >= F.lit(self.round_no)
            )
        )
        merged = newly if prev is None else prev.unionByName(newly)
        merged = merged.groupBy("bkey").agg(
            F.max("until_round").alias("until_round")
        )
        self._backoff_state = self._mat_state(merged, "backoff", single=True)

    def _update_delay_state(self, sched: DataFrame) -> None:
        """Record last_round for the DELAYED keys scheduled this round
        (keys without a crawl-delay never consult the state). Fast path
        (delay rules within budget): a pure driver-dict update fed by a
        LOCAL column read of the materialized sched parquet — ZERO Spark
        jobs per round (VERDICT r4 #4; the old path rewrote a state
        table every round). Over budget: the distributed rewrite."""
        if not self._respect_crawl_delay or self._delay_rules_count() == 0:
            return
        dmap = self._delay_map()
        if dmap is not None:
            keys = self._local_values(sched, self._key_col)
            doms = (
                keys
                if self._key_col == "registered_domain"
                else self._local_values(sched, "registered_domain")
            )
            if keys is None or doms is None:
                # batch too large / unreadable locally → one tiny collect
                pairs = [
                    (r[0], r[1])
                    for r in sched.select(self._key_col, "registered_domain")
                    .distinct().collect()
                ]
            else:
                pairs = zip(keys, doms)
            for k, d in pairs:
                if d in dmap:
                    self._delay_last[k] = (d, self.round_no)
            return
        newly = (
            sched.select(
                F.col(self._key_col).alias("dkey"), "registered_domain"
            )
            .distinct()
            .join(self._delays_plan().select("registered_domain"), "registered_domain")
            .select(
                "dkey",
                "registered_domain",
                F.lit(self.round_no).alias("last_round"),
            )
        )
        merged = (
            newly
            if self._delay_state is None
            else self._delay_state.unionByName(newly)
        )
        merged = merged.groupBy("dkey", "registered_domain").agg(
            F.max("last_round").alias("last_round")
        )
        self._delay_state = self._mat_state(merged, "crawl_delay", single=True)

    def _gc_scratch(self) -> None:
        import shutil

        old = os.path.join(self.scratch_dir, f"r{self.round_no - 2:06d}")
        shutil.rmtree(old, ignore_errors=True)

    # ------------------------------------------------------------------
    def start(self, resume: bool = False) -> None:
        snap = self.catalog.latest() if resume else None
        if snap is not None:
            self._state_parts["pending"] = self.catalog.paths(snap, "pending")
            self._state_parts["popped"] = []
            # snapshot pending was committed in the sorted layout — heads
            # scheduling resumes with it immediately
            pp = self._state_parts["pending"]
            self._sorted_base = pp[0] if len(pp) == 1 else None
            self.rules = (
                self.catalog.load(self.spark, snap, "rules") or self._empty(RULES_SCHEMA)
            )
            self._n_delay_rules = None
            self._delay_rounds_cache = None
            if self._respect_crawl_delay:
                ds = self.catalog.load(self.spark, snap, "crawl_delay_state")
                if ds is not None:
                    if self._delay_map() is not None:
                        # within budget: in-flight windows resume into the
                        # driver dict (O(#delayed-keys) rows by contract)
                        self._delay_last = {
                            r["dkey"]: (r["registered_domain"], int(r["last_round"]))
                            for r in ds.collect()
                        }
                    else:
                        self._delay_state = self._mat_state(
                            ds, "crawl_delay", single=True
                        )
            if self._backoff is not None:
                bs = self.catalog.load(self.spark, snap, "backoff_state")
                if bs is not None:
                    self._backoff_state = self._mat_state(
                        bs, "backoff", single=True
                    )
            for name in ("completed", "bad", "fingerprints"):
                self._state_parts[name] = self.catalog.paths(snap, name)
            if self._state_parts.get("bad"):
                self._n_bad_total = self.bad.count()
            self._init_known_doms()
            self.next_seq = int(snap.meta["next_seq"])
            self.round_no = int(snap.meta["round_no"])
            if self.bloom is not None:
                # rebuild the membership filter from the resumed seen keys —
                # an empty filter would answer false negatives and re-admit
                self.bloom_state = self._mat_state(
                    self.bloom.build(self._seen_keys()), "bloom", single=True
                )
            return
        # fresh start: admit seeds (ref crawler/frontier.py:60-67)
        self.rules = self._empty(RULES_SCHEMA)
        self.next_seq = 0
        self.round_no = 0
        # seed order must be the config order (deterministic), so enumerate
        # driver-side rather than relying on partition-dependent ids
        if self.corpus_dir is not None:
            import pyarrow.parquet as pq

            seed_urls = pq.read_table(f"{self.corpus_dir}/seeds.parquet").column("url").to_pylist()
        else:
            seed_urls = list(self.config.seed_urls)
        cands = self.spark.createDataFrame(
            [(u, 0, "seed", -1, i, 0) for i, u in enumerate(seed_urls)],
            ["raw_url", "depth", "src", "parent_seq", "link_pos", "sub_pos"],
        ).withColumn("parent_seq", F.col("parent_seq").cast("long"))
        self._admit(cands)
        self._checkpoint_state()

    def start_from_frontier(self, pending: DataFrame, rules: DataFrame, next_seq: int) -> None:
        """Bulk-load a pre-built pending frontier (bench / resume-from-
        external): all robots rules pre-parsed, empty memories. The load
        writes the sorted compacted layout so heads scheduling prunes
        from round 1."""
        self.round_no = 0
        self._append_state_delta(pending, "pending", single=False)
        # force-compact: rewrites the load into the sorted layout with the
        # row-scaled file count (footer counts are readable only after the
        # first write)
        self._compact_pending(force=True)
        self.rules = rules
        self._n_delay_rules = None
        self._delay_rounds_cache = None
        self.next_seq = next_seq
        self._init_known_doms()
        self._checkpoint_state()
        if self.bloom is not None:
            self.bloom_state = self._mat_state(
                self.bloom.build(self.pending.select("url_hash")), "bloom", single=True
            )

    # ------------------------------------------------------------------
    def _init_known_doms(self) -> None:
        """Seed the cache from the rules table (resume / bulk load);
        disable it when the domain count exceeds the budget."""
        rows = (
            self.rules.select("registered_domain").distinct()
            .limit(self._known_doms_limit + 1).collect()
        )
        if len(rows) > self._known_doms_limit:
            self._known_doms = None
        else:
            self._known_doms = {r[0] for r in rows}

    def _local_values(self, df: DataFrame, col: str):
        """Cheap driver-side column read for small MATERIALIZED frames
        (local parquet); None → caller uses the distributed path."""
        path = getattr(df, "_crawlspark_path", None)
        if path is None:
            return None
        n = _pq_rows(path)
        if n is None or n > 200_000:
            return None
        import pyarrow.parquet as pq

        try:
            return pq.read_table(path, columns=[col]).column(col).to_pylist()
        except Exception:
            return None

    def _seen_keys(self) -> DataFrame:
        # raw pending parts WITHOUT the tombstone anti-join: popped rows
        # are in `completed` anyway, and seen-ness only needs a superset
        # union — one less join in the admission anti-join's plan
        return (
            self._state_table("pending", FRONTIER_SCHEMA)
            .select("url_hash")
            .union(self.completed.select("url_hash"))
        )

    def _admit(self, candidates: DataFrame) -> int:
        # unique scratch name per materialization within this round —
        # admission's fixpoint loop must never overwrite a path an earlier
        # returned DataFrame still reads from
        cnt = [0]

        def mat(df: DataFrame, name: str) -> DataFrame:
            cnt[0] += 1
            return self._mat(df, f"{name}_{cnt[0]}")

        res = ADM.admit(
            self.spark,
            candidates,
            mat,
            self._seen_keys(),
            self.rules,
            self.robots_bodies,
            self.sitemap_xml,
            self.config,
            self.next_seq,
            self.round_no,
            bloom=self.bloom,
            bloom_state=self.bloom_state,
            row_counter=fast_count,
            known_domains=self._known_doms,
            local_values=self._local_values,
            # rules rows ≈ few per domain; broadcast only while the
            # domain count is known to be under the cache budget
            broadcast_rules=self._known_doms is not None,
        )
        if res.new_rows is None:
            return 0
        rows = res.new_rows
        n = fast_count(rows)
        self.next_seq += n
        new_pending = rows.filter(F.col("status") == "pending")
        blocked = rows.filter(F.col("status") == "robots_blocked")
        # rows is materialized — when its status column is locally
        # readable, skip writing empty splits (robots_blocked is ~0 in
        # steady state: one empty-delta job saved per round); the splits
        # that do exist are independent tables and write concurrently
        statuses = self._local_values(rows, "status")
        n_blocked = statuses.count("robots_blocked") if statuses is not None else None
        deltas: list = []
        if n_blocked is None or n_blocked < n:
            deltas.append((new_pending, "pending", True))
        if n_blocked is None or n_blocked > 0:
            deltas.append(
                (
                    blocked.withColumns(
                        {
                            "completed_round": F.lit(None).cast("int"),
                            "total_words": F.lit(None).cast("int"),
                            "n_distinct_words": F.lit(None).cast("int"),
                        }
                    ),
                    "completed",
                    True,
                )
            )
        # pending/blocked deltas and the bloom-state rebuild both read
        # only the materialized `rows` parquet — overlap them
        join_deltas = self._append_state_deltas_async(deltas)
        if res.new_rules is not None:
            self.rules = self.rules.unionByName(res.new_rules)
            self._rules_dirty = True
            self._n_delay_rules = None
            self._delay_rounds_cache = None
            if self._known_doms is not None:
                # keep the cache coherent when the relational path ran
                # (huge batch); fast-path updates happened in-place
                self._known_doms |= {
                    r[0]
                    for r in res.new_rules.select("registered_domain")
                    .distinct().collect()
                }
                if len(self._known_doms) > self._known_doms_limit:
                    self._known_doms = None
        try:
            if self.bloom is not None:
                delta_filter = self.bloom.build(rows.select("url_hash"))
                merged = (
                    delta_filter
                    if self.bloom_state is None
                    else self.bloom.merge(self.bloom_state, delta_filter)
                )
                self.bloom_state = self._mat_state(merged, "bloom", single=True)
        finally:
            join_deltas()  # settle/register (or clean up) the delta writes
        return n

    def _checkpoint_state(self) -> None:
        # pending is delta-maintained (see the `pending` property) — only
        # rules need pinning, and only when they changed
        if getattr(self, "_rules_dirty", True):
            self.rules = self._mat_state(self.rules, "rules", single=True)
            self._rules_dirty = False
        if len(self._state_parts.get("popped", [])) >= int(
            self.config.extra.get("pending_compact_parts", 64)
        ):
            self._compact_pending()

    def _commit_snapshot(self) -> None:
        # snapshot pending in the sorted range-partitioned layout (tight
        # per-file manifest bounds; see _sorted_layout)
        pending_sorted = self._sorted_layout(self.pending)
        tables: dict = {
            "pending": pending_sorted,
            "rules": self.rules,
            "completed": list(self._state_parts.get("completed", [])),
            "bad": list(self._state_parts.get("bad", [])),
            "fingerprints": list(self._state_parts.get("fingerprints", [])),
        }
        if self._respect_crawl_delay and self._delay_last:
            # Crawl-delay pacing state rides the snapshot so a resumed
            # crawl keeps honoring in-flight delay windows (driver dict
            # serialized to the same (dkey, registered_domain,
            # last_round) schema the distributed path uses)
            tables["crawl_delay_state"] = self.spark.createDataFrame(
                [(k, d, lr) for k, (d, lr) in self._delay_last.items()],
                "dkey string, registered_domain string, last_round int",
            )
        elif self._respect_crawl_delay and self._delay_state is not None:
            tables["crawl_delay_state"] = self._delay_state
        if self._backoff is not None and self._backoff_state is not None:
            # circuit-breaker benches survive resume the same way
            tables["backoff_state"] = self._backoff_state
        snap = self.catalog.commit(
            tables,
            meta={
                "next_seq": self.next_seq,
                "round_no": self.round_no,
                "rounds": [
                    {
                        "round": r.round_no,
                        "scheduled": r.scheduled,
                        "new_urls": r.new_urls,
                        "by_status": r.by_status,
                        "seconds": r.seconds,
                        "sched_scan": r.sched_scan,
                    }
                    for r in self.stats.rounds[-self.checkpoint_interval :]
                ],
            },
            file_annotators=(
                {"pending": self._annotate_tail_stats} if self._heads_sched else None
            ),
        )
        # the committed pending is a clean full table → adopt it as the
        # compacted base and drop the tombstones it folded in
        self._state_parts["pending"] = self.catalog.paths(snap, "pending")
        self._state_parts["popped"] = []
        pp = self._state_parts["pending"]
        self._sorted_base = pp[0] if len(pp) == 1 else None
        # parts list rewritten → stale HEADS-table indexes; rebuild lazily
        self._heads_df = None
        # drop stats of superseded bases (the new base's entries load
        # lazily from the snapshot manifest on first use)
        self._fstats_cache = {
            k: v for k, v in self._fstats_cache.items() if k == self._sorted_base
        }
        # snapshot maintenance: bounded history when configured (the
        # adopted base above is the NEW snapshot's — always survives)
        keep = self.config.extra.get("snapshot_keep_last")
        if keep:
            self.catalog.expire_snapshots(int(keep))

    # ------------------------------------------------------------------
    def run_round(self) -> bool:
        t0 = time.monotonic()
        import os as _os

        _dbg = _os.environ.get("CRAWLSPARK_DEBUG_TIMING")
        _last = [t0]

        def _mark(label: str) -> None:
            if _dbg:
                now = time.monotonic()
                print(f"    [{self.round_no}] {label}: {now - _last[0]:.1f}s", flush=True)
                _last[0] = now

        cfg = self.config
        self.round_no += 1

        sched_src, sched_scan = self._pending_for_schedule()
        blocked = self._blocked_keys()
        if blocked is not None:
            sched_src = sched_src.join(blocked, self._key_col, "left_anti")
        sched = self._mat(
            schedule_round(
                sched_src, cfg.per_domain_quota, self._key_col,
                order_col=self._priority_col,
            ),
            "sched",
        )
        n_sched = fast_count(sched)
        _mark("schedule")
        if n_sched == 0:
            if blocked is not None and (
                self.pending.join(blocked, self._key_col, "left_semi")
                .limit(1)
                .count()
                > 0
            ):
                # everything pending sits inside a Crawl-delay window —
                # this round is an IDLE politeness tick, not termination
                dt = time.monotonic() - t0
                self.stats.rounds.append(
                    RoundStats(self.round_no, 0, 0, {}, dt, sched_scan)
                )
                if self.pace_wallclock:
                    time.sleep(max(0.0, cfg.politeness_delay_s - dt))
                self._gc_scratch()
                return True
            self.round_no -= 1
            return False
        self._update_delay_state(sched)

        s = sched.withColumn("sim_tokens", BAD.sim_tokens(F.col("url")))

        # pop-order gates (worker.py:54-79), against round-start bad state.
        # One broadcast join covers both bad-URL kinds; flags per url.
        # `hits` stays LAZY: its two consumers (the fetchable anti-join
        # inside the routed write, the flag join inside the statused
        # write) each evaluate the small broadcast join + agg in-job —
        # cheaper than a dedicated materialization round-trip per round.
        depth_ok = F.col("depth") <= cfg.max_depth
        rest = s.filter(depth_ok)
        if self._n_bad_total == 0:
            # no bad-URL memory yet → the similarity join is empty by
            # construction; skip the whole plan
            hits = self.spark.createDataFrame(
                [], "url string, low_hit boolean, err_hit boolean"
            )
        else:
            hits = (
                BAD.similarity_hits(
                    rest, self.bad, cfg.jaccard_threshold, cfg.jaccard_similar_count,
                    broadcast_bad=self._n_bad_total <= self._broadcast_bad_limit,
                )
                .groupBy("url")
                .agg(
                    F.max(F.col("kind") == "low_data").alias("low_hit"),
                    F.max(F.col("kind") == "error").alias("err_hit"),
                )
            )
        fetchable = rest.join(hits, "url", "left_anti").filter(
            ~traps.is_trap(F.col("url"))
        )

        # ONE fetch+route+fingerprint materialization per round: the
        # simhash rides the routed write as a scalar Arrow UDF gated to
        # parse rows (the corpus scan happens exactly once; the former
        # routed0 → simhash-join → routed chain cost a second full write).
        # slim the broadcast side to the 4 columns fetch/discovery need —
        # sim_tokens and the other frontier columns would triple the
        # broadcast payload
        fetch_in = fetchable.select("url_hash", "url", "depth", "discovery_seq")
        bb = n_sched <= self._batch_broadcast_limit
        if cfg.extra.get("fetch_mode") == "http":
            from crawlspark.operators import httpfetch as HF

            routed_plan = HF.live_fetch_and_route(
                fetch_in, cfg, cfg.extra.get("http_transport")
            )
        else:
            pages_src = self.pages
            if self.pages_bucketed:
                touched = [
                    r["pb"]
                    for r in sched.select(
                        F.pmod(F.col("url_hash"), F.lit(cfg.frontier_buckets))
                        .cast("int").alias("pb")
                    ).distinct().collect()
                ]
                pages_src = self.pages.filter(F.col("pbucket").isin(touched))
            # hits-only join (ONE pages scan); the fetchable count rides
            # the broadcast side so the miss-recovery job below runs only
            # when a scheduled URL actually had no corpus row
            from pyspark.sql import Observation

            obs_fetchable = Observation()
            routed_plan = FE.fetch_hits_and_route(
                fetch_in.observe(obs_fetchable, F.count(F.lit(1)).alias("n")),
                pages_src, cfg, broadcast_batch=bb,
            )
        # route_verdict emits simhash + word counts from a single Arrow
        # pass over the captions, so the plan is write-ready as-is
        parse_cond = F.col("route") == "parse"
        routed = self._mat(routed_plan, "routed")
        if cfg.extra.get("fetch_mode") != "http":
            n_hits = fast_count(routed)
            # obs_fetchable fires only if the join produced rows — AQE's
            # empty-relation propagation eliminates the observed subtree
            # when either join side is empty and .get would block forever
            # (probed empirically). Zero hits ⇒ can't know the fetchable
            # count cheaply ⇒ run the miss recovery unconditionally (it
            # writes nothing when fetchable was empty too).
            n_miss = (
                int(obs_fetchable.get["n"]) - n_hits if n_hits > 0 else 1
            )
            if n_miss > 0:
                # recover misses as 'fetch_error' rows: a tiny job over
                # the scheduled batch anti-joined to the materialized
                # hits — no pages scan (worker.py's download-exception
                # path). Written column-for-column like the hits part so
                # both dirs read back as one frame.
                missing = fetch_in.join(
                    routed.select("url_hash"), "url_hash", "left_anti"
                )
                miss_plan = FE.route_verdict(
                    missing.select("*", *FE.null_page_cols()), cfg
                ).select(*[F.col(c) for c in routed.columns])
                routed_miss = self._mat(miss_plan, "routed_miss", single=True)
                routed = self.spark.read.parquet(
                    routed._crawlspark_path, routed_miss._crawlspark_path
                )
        # near-dup probe vs round-start fingerprint state — LAZY: its only
        # consumer is the statused write job below; the banded broadcast
        # join over the materialized routed parquet evaluates exactly once
        nd = FE.neardup_hits(
            routed.filter(parse_cond).select("url_hash", "simhash"),
            self.fingerprints, cfg.simhash_max_hamming, broadcast_batch=bb,
        )
        _mark("routed")

        # terminal statuses for every scheduled row (the reference marks
        # every popped URL complete)
        base = s.drop("sim_tokens")
        statused = (
            base.join(hits, "url", "left")
            .join(
                routed.select(
                    "url_hash", "route", "total_words", "n_distinct_words"
                ),
                "url_hash",
                "left",
            )
            .join(nd.withColumn("_nd", F.lit(True)), "url_hash", "left")
            .withColumn(
                "status",
                F.when(~depth_ok, "depth_skip")
                .when(F.col("low_hit"), "lowdata_similar_skip")
                .when(F.col("err_hit"), "error_similar_skip")
                .when(F.col("route").isNull(), "trap_skip")
                .when((F.col("route") == "parse") & F.col("_nd"), "neardup")
                .when(F.col("route") == "parse", "parsed")
                .otherwise(F.col("route")),
            )
            .withColumn("completed_round", F.lit(self.round_no))
            .select(*[n for n, _ in FRONTIER_FIELDS + COMPLETED_EXTRA])
        )
        # per-status counts ride the delta write itself (Observation —
        # aggregates collected during the write job), replacing a second
        # full read+groupBy job per round. STATUS_VALUES is the closed set
        # route_verdict ∪ the gate statuses produce; the _total cross-check
        # falls back to the exact groupBy if a value ever escapes it.
        from pyspark.sql import Observation

        obs = Observation()
        statused_obs = statused.observe(
            obs,
            F.count(F.lit(1)).alias("_total"),
            *[
                F.sum((F.col("status") == sv).cast("long")).alias(sv)
                for sv in STATUS_VALUES
            ],
        )

        # Driver-side route counts from the materialized routed parquet
        # (pyarrow footer+column read, NO Spark job). They gate the
        # bad/fingerprints writes and the admission phase below, which
        # lets the statused write itself join the async wave instead of
        # blocking the round (VERDICT r4 #4): previously admission waited
        # on the statused write only to learn by_status for its gates.
        routes = self._local_values(routed, "route")
        n_parse_routed = routes.count("parse") if routes is not None else None

        # state deltas ------------------------------------------------
        # completed / bad / fingerprints / popped read only already-
        # materialized parquet (routed, sched) plus lazy broadcast-join
        # plans (hits, nd), and land in four different tables, so ALL
        # four writes run concurrently AND overlap the whole admission
        # phase (one driver round-trip where there were three).
        round_deltas: list = [
            (statused_obs, "completed", False),
            # frontier update: scheduled keys become tombstones (O(batch)
            # append — never an O(frontier) rewrite); discoveries enter
            # via _admit's pending delta
            (sched.select("url_hash"), "popped", True),
        ]
        if n_parse_routed is None or n_parse_routed > 0:
            # fingerprints are recorded for every parse row, neardup or
            # not (worker.py:129-137) — the route count is the exact gate
            round_deltas.append(
                (
                    routed.filter(F.col("route") == "parse").select(
                        "url_hash", "simhash"
                    ),
                    "fingerprints",
                    True,
                )
            )
        # bad-memory gate, conservative but exact-when-zero: similar-skip
        # statuses require prior bad memory (hits is the empty relation
        # when _n_bad_total == 0), and low_data/error statuses are
        # locally countable route values — so gate-off implies n_bad == 0
        may_have_bad = (
            routes is None
            or self._n_bad_total > 0
            or "low_data" in routes
            or "error" in routes
        )
        if may_have_bad:
            err_hash = routed.filter(
                (F.col("route") == "error") & (F.col("http_status") >= 400)
            ).select("url_hash")
            low_hash = routed.filter(F.col("route") == "low_data").select("url_hash")
            new_bad = (
                s.join(statused.filter(F.col("status") == "lowdata_similar_skip")
                       .select("url_hash"), "url_hash", "left_semi")
                .unionByName(s.join(low_hash, "url_hash", "left_semi"))
                .select("url", "host", F.lit("low_data").alias("kind"), "sim_tokens")
                .unionByName(
                    s.join(statused.filter(F.col("status") == "error_similar_skip")
                           .select("url_hash"), "url_hash", "left_semi")
                    .unionByName(s.join(err_hash, "url_hash", "left_semi"))
                    .select("url", "host", F.lit("error").alias("kind"), "sim_tokens")
                )
            )
            round_deltas.append((new_bad, "bad", True))
        join_deltas = self._append_state_deltas_async(round_deltas)
        _mark("pending_update")

        if self._backoff is not None:
            self._update_backoff_state(s, routed)

        # discovery ----------------------------------------------------
        # the statused 'parsed' set, derived without the statused join
        # chain: routed contains exactly the fetchable rows (depth/trap/
        # similar-hit rows were anti-joined out before the fetch), so
        # status == 'parsed' ⟺ route == 'parse' ∧ not near-duplicate
        parsed_final = (
            routed.filter(F.col("route") == "parse")
            .join(nd, "url_hash", "left_anti")
            .select("url", "url_hash", "depth", "discovery_seq", "out_links")
        )
        links = parsed_final.select(
            F.posexplode("out_links").alias("link_pos", "href"),
            F.col("url").alias("base"),
            (F.col("depth") + 1).alias("depth"),
            F.col("discovery_seq").alias("parent_seq"),
        ).select(
            U.resolve_href(F.col("base"), F.col("href")).alias("raw_url"),
            "depth",
            F.lit("link").alias("src"),
            "parent_seq",
            "link_pos",
            F.lit(0).alias("sub_pos"),
        )
        redirects = routed.filter(
            (F.col("route") == "redirect") & F.col("redirect_to").isNotNull()
        ).select(
            F.col("redirect_to").alias("raw_url"),
            "depth",  # redirects keep depth (worker.py:94)
            F.lit("redirect").alias("src"),
            F.col("discovery_seq").alias("parent_seq"),
            F.lit(0).alias("link_pos"),
            F.lit(0).alias("sub_pos"),
        )
        candidates = redirects.unionByName(links)

        # admission overlaps the four state writes above: it reads only
        # pending-base + round-start completed parts for seen-ness (the
        # scheduled batch's keys are still in pending-base — tombstones
        # fold in at compaction, which runs after the writes join), and
        # its own deltas get distinct lock-allocated paths. The gate is
        # route-count conservative: a round whose parse rows ALL end
        # neardup runs one empty admission pass (a no-op for state).
        admit_gate = (
            routes is None or n_parse_routed > 0 or "redirect" in routes
        )
        n_new = self._admit(candidates) if admit_gate else 0
        _mark("admit")
        join_deltas()
        m = obs.get
        by_status = {sv: int(m[sv]) for sv in STATUS_VALUES if m[sv]}
        if sum(by_status.values()) != int(m["_total"]):  # unknown status value
            by_status = {
                r["status"]: r["cnt"]
                for r in self.spark.read.parquet(join_deltas.paths[0])
                .groupBy("status").agg(F.count("*").alias("cnt")).collect()
            }
        n_bad = sum(
            v for k, v in by_status.items()
            if k in ("lowdata_similar_skip", "error_similar_skip", "low_data")
        ) + by_status.get("error", 0)
        self._n_bad_total += n_bad
        _mark("deltas_join")
        self._checkpoint_state()
        _mark("ckpt_state")

        dt = time.monotonic() - t0
        self.stats.rounds.append(
            RoundStats(self.round_no, n_sched, n_new, by_status, dt, sched_scan)
        )
        if self.round_no % self.checkpoint_interval == 0:
            self._commit_snapshot()
        if self.pace_wallclock:
            time.sleep(max(0.0, cfg.politeness_delay_s - dt))
        self._gc_scratch()
        return True

    # ------------------------------------------------------------------
    def run(self, max_rounds: int | None = None) -> CrawlStats:
        limit = max_rounds or self.config.max_rounds or 10**9
        while len(self.stats.rounds) < limit:
            if not self.run_round():
                break
        self._commit_snapshot()
        return self.stats

    # all frontier rows ever admitted (for reports)
    def all_rows(self) -> DataFrame:
        return self.pending.withColumns(
            {
                "completed_round": F.lit(None).cast("int"),
                "total_words": F.lit(None).cast("int"),
                "n_distinct_words": F.lit(None).cast("int"),
            }
        ).unionByName(self.completed)
