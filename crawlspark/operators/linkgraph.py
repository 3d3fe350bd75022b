"""Link-graph ranking for crawl prioritization.

The reference crawler schedules its frontier purely FIFO-within-domain
(crawler/frontier.py:34-58) — every discovered URL is equally urgent.
At 10^10-URL scale a frontier needs a global priority signal, and the
classic one is PageRank over the link graph the crawl itself produces
(parse.py's extracted links are exactly the edge stream). This module
implements damped PageRank as a fixed-iteration composition of
DataFrame joins + aggregations, designed around the one asymmetry that
matters at scale:

- the EDGE table is huge (one row per link, ~10^11 rows at full crawl
  scale) and IMMUTABLE across iterations;
- the RANK vector is small (one row per node) and changes every
  iteration.

So the operator repartitions the edge table by ``src`` ONCE and
persists it; every iteration then shuffles only the rank vector — once
by ``src`` (to meet the persisted edge partitioning for the join, so
the edge side's exchange is reused, not re-executed) and once by
``dst`` for the contribution sum. Per iteration the big table moves
zero bytes.

Semantics (deliberately the plain, SQL-unrollable variant so the
driver's DuckDB oracle can replay it exactly):

    rank_0(v)   = 1/N
    rank_i+1(v) = (1-d)/N + d * sum_{(u,v) in E} rank_i(u)/outdeg(u)

Dangling nodes (no out-links) leak their mass — no redistribution —
which matches the unrolled SQL and keeps every iteration a single
join+agg. Ranks are rounded to 12 decimals each iteration on BOTH
engines so the per-edge contributions entering each sum are bitwise
identical; the final 6-decimal round absorbs residual summation-order
differences (see driver-oracle notes in __spark_entry__).

Lineage depth grows linearly with iterations; for deep runs pass
``materialize_every`` to cut the plan at a parquet scratch directory
(localCheckpoint loops degrade the driver — parquet scratch does not).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCRATCH_DIRS: list[str] = []


def _scratch_cleanup() -> None:
    for d in _SCRATCH_DIRS:
        shutil.rmtree(d, ignore_errors=True)
    _SCRATCH_DIRS.clear()


atexit.register(_scratch_cleanup)


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    materialize_every: int | None = None,
) -> DataFrame:
    """Damped PageRank over a directed edge list. Returns
    ``(id, rank)`` with ``rank`` rounded to 6 decimals.

    ``edges`` is deduplicated (multi-edges would double-count mass and
    make outdeg ambiguous). Nodes are everything that appears on either
    side of an edge. ``materialize_every=k`` writes the rank vector to
    parquet scratch every k iterations to bound plan depth on long
    runs; the scratch dirs are removed at interpreter exit.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")

    spark = edges.sparkSession
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    # The one big shuffle: partition the edge table by src once.  Every
    # iteration's join reuses this partitioning (the persisted exchange
    # output), so only the rank vector moves per iteration.
    e = e.repartition("src").persist()

    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # also materializes the persisted edges/nodes
    if n == 0:
        e.unpersist()
        nodes.unpersist()
        return spark.createDataFrame([], "id long, rank double")

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("outdeg"))

    base = float(1.0 - damping) / n
    ranks = nodes.select("id", F.round(F.lit(1.0 / n), 12).alias("rank"))

    scratch = None
    for i in range(n_iter):
        contrib = (
            ranks.join(outdeg, ranks["id"] == outdeg["src"], "inner")
            .join(e, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("mass"))
        )
        ranks = nodes.join(contrib, nodes["id"] == contrib["dst"], "left").select(
            "id",
            F.round(
                F.lit(base) + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0)),
                12,
            ).alias("rank"),
        )
        if materialize_every and (i + 1) % materialize_every == 0 and i + 1 < n_iter:
            if scratch is None:
                scratch = tempfile.mkdtemp(prefix="crawlspark_pagerank_")
                _SCRATCH_DIRS.append(scratch)
            path = f"{scratch}/iter_{i + 1}"
            ranks.write.mode("overwrite").parquet(path)
            ranks = spark.read.parquet(path)

    return ranks.select("id", F.round("rank", 6).alias("rank"))
