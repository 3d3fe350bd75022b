"""Physical-plan shape guards: the scale-sensitive operators must not
regress to the plans that die at 100x data (VERDICT r1)."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawlspark.operators import dedup as DD
from crawlspark.operators import similarity as SIM


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_embedding_neardup_has_no_crossjoin(spark):
    """Exact near-dup is a blocked-GEMM applyInPandas join — the N x N
    CartesianProduct/BroadcastNestedLoop plan must never come back."""
    plan = _plan(DD.embedding_neardup_pairs(_embeddings(spark), threshold=0.45))
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsIn" in plan


def test_embedding_neardup_lsh_has_no_crossjoin(spark):
    plan = _plan(
        DD.embedding_neardup_lsh_pairs(_embeddings(spark), threshold=0.9)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_lsh_has_no_crossjoin_and_prunes_columns(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = DD.minhash_lsh_pairs(docs, "doc_id", "text", 3, 0.8)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # scan must not drag untouched wide columns through the pipeline
    assert "ReadSchema" in plan and "title" not in plan.split("ReadSchema", 1)[1][:400]


def test_ann_topk_is_bucket_join_not_scan(spark):
    emb = _embeddings(spark)
    df = SIM.ann_hyperplane_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_ivf_is_cell_join_not_scan(spark):
    emb = _embeddings(spark)
    df = SIM.ann_ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=3, n_cells=8, nprobe=2)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_corpus_prep_is_three_shuffles_no_crossjoin(spark):
    """The end-to-end pipeline must stay one declarative plan: exactly
    the dedup window's hash exchange, the pack window's hash exchange,
    and the output sort's range exchange — nothing else, and never a
    cartesian/BNLJ."""
    import re

    import __spark_entry__ as E

    df = E.queries()["corpus_prep"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert len(re.findall(r"\bExchange\b", plan)) <= 3
    assert len(re.findall(r"\bWindow\b", plan)) == 2


def test_sample_stratified_is_shuffle_free_and_prunes(spark):
    """The deterministic sample is a projection + filter: no Exchange
    node at all, and the parquet scan must not read the text column."""
    from crawlspark.operators import sampling as SP

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = SP.sample_stratified(docs.select("doc_id", "lang"), "lang", {"en": 1.0}, 0.25)
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "text" not in plan.split("ReadSchema")[-1]


def test_pack_token_budget_single_partitioned_window(spark):
    """One hash-partitioned window per stratum — exactly one shuffle,
    never a global (partition-less) window."""
    from crawlspark.operators import sampling as SP

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(SP.pack_token_budget(docs, 512, "lang"))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in plan


def test_revenue_by_nation_sql_broadcasts_dims(spark):
    """The raw-SQL 4-table rollup must resolve to broadcast hash joins
    (nation/customer/orders are the small sides at any SF where they fit
    the broadcast budget) — no sort-merge cascade, no BNLJ."""
    import __spark_entry__ as E

    plan = _plan(E.q_revenue_by_nation(spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_dust_rules_is_joinless_two_aggregates(spark):
    """Rule mining must stay one explode + two hash aggregates — any
    Join node means the plan regressed to a pairwise formulation that
    dies on a hot host at web scale."""
    from crawlspark.operators import dust as DU

    pages = spark.createDataFrame(
        [("http://a.com/p?id=1&s=x", "F1")], ["url", "fp"]
    )
    plan = _plan(DU.dust_rules(pages, "url", "fp", 2))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_apply_dust_rules_broadcasts_rule_table(spark):
    """The rewrite joins the KB-sized rule table — it must broadcast,
    never shuffle the page scan."""
    from crawlspark.operators import dust as DU

    pages = spark.createDataFrame(
        [("http://a.com/p?id=1&s=x", "F1")], ["url", "fp"]
    )
    rules = spark.createDataFrame([("a.com", "s", 2)], ["host", "param", "support"])
    plan = _plan(DU.apply_dust_rules(pages, rules, "url"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_shard_stats_single_aggregate_exchange(spark):
    """The shard audit is one partial-aggregated groupBy — exactly one
    hash exchange over shard ids, no window, no sort."""
    from crawlspark.operators import sharding as SH

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(SH.shard_stats(docs, 8))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan
    # only the needed columns reach the scan
    assert "text" not in plan.split("ReadSchema")[-1]


def test_dedup_keep_best_winner_is_aggregate_not_window(spark):
    """Canonical selection must pick winners via the map-side-partial
    min(struct) aggregate — a per-component window sort would serialize
    a degenerate boilerplate cluster onto one task."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(DD.dedup_keep_best(docs, "doc_id", "text", 3, 0.8))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_lm_perplexity_plan_scalar_bnlj_only(spark):
    """The only nested-loop join allowed is the 1-row vocabulary-size
    scalar broadcast; the model joins must be hash joins and the scans
    must prune to (doc_id, text)."""
    from crawlspark.operators import lm as LM

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(LM.bigram_lm_scores(docs))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "SortMergeJoin" not in plan  # equi-joins resolve to hash joins
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "lang" not in line and "source" not in line, line


def test_aqe_splits_skewed_join_partitions(spark):
    """The session's AQE skew-join config actually fires: a join whose
    left side funnels ~90% of rows through one key gets its hot
    partition SPLIT at runtime (SortMergeJoin(skew=true) in the final
    adaptive plan) instead of one straggler task owning the key. This is
    the runtime backstop the dedup/inverted-index operators' docstrings
    lean on for hot-shingle and hot-bucket skew."""
    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
    }
    old = {k: spark.conf.get(k) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        # incompressible pad so the hot key's shuffle partition is
        # genuinely oversized after compression
        pad = F.md5(F.col("id").cast("string"))
        left = spark.range(120_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            pad.alias("pad"),
        )
        right = spark.range(1_000).select(F.col("id").alias("k"), pad.alias("rpad"))
        joined = left.join(right, "k").select("k", "pad")
        rows = joined.collect()  # executes THIS frame's plan -> AQE finalizes
        assert len(rows) == 120_000 * 9 // 10 + sum(
            1 for i in range(120_000) if i % 10 >= 9 and i < 1_000
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """Partition-layout + DPP: a fact table written partitioned by day
    and joined to a filtered dim gets a runtime `dynamicpruning`
    PartitionFilter on its scan — at 100 TB this is the difference
    between scanning 3 partitions and scanning 3,000. Values must equal
    the statically-filtered join."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "user_id", "value",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    fact_path = str(tmp_path / "fact")
    ev.write.partitionBy("day").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    n_days = fact.select("day").distinct().count()
    keep_days = [r["day"] for r in fact.select("day").distinct().orderBy("day").limit(3).collect()]
    dim = spark.createDataFrame(
        [(d, 1) for d in keep_days] + [(f"x{i}", 0) for i in range(5)],
        ["day", "keep"],
    )
    joined = fact.join(dim.filter(F.col("keep") == 1), "day").select(
        "event_id", "day"
    )
    rows = joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan
    expect = fact.filter(F.col("day").isin(keep_days)).count()
    assert len(rows) == expect and expect > 0
    assert n_days > 3  # there was actually something to prune


def test_dim_param_skips_probe_jobs(spark):
    """With ``dim`` supplied, ann_ivf_topk and semdedup must build their
    plans without running ANY Spark job (the old default ran a one-row
    ``first()`` probe per invocation to learn the embedding dim —
    VERDICT r4 #6)."""
    emb = _embeddings(spark)
    emb.count()  # materialize the relation before the probe window
    sc = spark.sparkContext
    sc.setJobGroup("dim-probe-gate", "plan construction must be job-free")
    try:
        SIM.ann_ivf_topk(
            emb, emb.filter(F.col("vec_id") < 5), k=3, n_cells=8, nprobe=2, dim=64
        )
        DD.semdedup(emb, n_cells=8, eps=0.99, dim=64)
    finally:
        sc.setJobGroup("dim-probe-gate-done", "")
    jobs = sc.statusTracker().getJobIdsForGroup("dim-probe-gate")
    assert jobs == [], f"plan construction ran Spark jobs: {jobs}"
