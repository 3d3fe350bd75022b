"""Temporal join operators (operators/joins.py): as-of join and bucketed
range join — value semantics against brute-force references plus plan
shape (the range join must stay a hash equi-join, never BNLJ)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from crawlspark.operators import joins as J


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ts(s: float):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_join_backward_inclusive_and_exclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts(10.0)), (1, _ts(20.0)), (1, _ts(5.0)), (2, _ts(10.0))],
        ["k", "ts"],
    ).withColumn("lid", F.monotonically_increasing_id())
    right = spark.createDataFrame(
        [(1, _ts(10.0), 100.0), (1, _ts(15.0), 150.0), (3, _ts(1.0), 999.0)],
        ["k", "ts", "v"],
    )
    inc = {
        (r["k"], r["ts"]): r["v"]
        for r in J.asof_join(left, right, on="k", value_cols=["v"]).collect()
    }
    # ts=10 matches the right row AT 10 (inclusive); ts=20 takes the
    # latest (15); ts=5 has no prior row; key 2 never matches
    assert inc[(1, _ts(10.0))] == 100.0
    assert inc[(1, _ts(20.0))] == 150.0
    assert inc[(1, _ts(5.0))] is None
    assert inc[(2, _ts(10.0))] is None
    exc = {
        (r["k"], r["ts"]): r["v"]
        for r in J.asof_join(
            left, right, on="k", value_cols=["v"], allow_exact=False
        ).collect()
    }
    assert exc[(1, _ts(10.0))] is None  # strict '<' skips the tie


def test_asof_join_struct_is_row_atomic(spark):
    """Multiple value columns must come from the SAME right row, even
    when a later right row has a null field (the per-column
    last(ignorenulls) pitfall the struct packing exists to avoid)."""
    left = spark.createDataFrame([(1, _ts(30.0))], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, _ts(10.0), 10.0, "a"), (1, _ts(20.0), None, "b")],
        "k long, ts timestamp, v double, tag string",
    )
    row = J.asof_join(left, right, on="k", value_cols=["v", "tag"]).collect()[0]
    # latest right row is (None, 'b') — v must be null WITH tag 'b', not
    # the earlier row's 10.0 spliced in
    assert row["tag"] == "b" and row["v"] is None


def test_range_join_matches_naive_join(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("lid"), "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("rid"), "user_id", "ts"
    )
    got = {
        (r["lid"], r["r_rid"])
        for r in J.range_join(
            left, right, on="user_id", window_sec=7200.0
        ).collect()
    }
    naive = {
        (r["lid"], r["rid"])
        for r in left.alias("a")
        .join(right.alias("b"), "user_id")
        .filter(
            (F.col("b.ts") >= F.col("a.ts"))
            & (
                F.unix_micros(F.col("b.ts").cast("timestamp"))
                <= F.unix_micros(F.col("a.ts").cast("timestamp")) + 7200_000_000
            )
        )
        .select(F.col("a.lid").alias("lid"), F.col("b.rid").alias("rid"))
        .collect()
    }
    assert got == naive and len(got) > 0


def test_range_join_plan_is_equi_hash_join(spark):
    """The bucketed rewrite must execute as a hash/sort-merge equi-join —
    a BroadcastNestedLoopJoin or CartesianProduct means the interval
    predicate leaked into the join condition (quadratic at scale)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df = J.range_join(
        ev.select(F.col("event_id").alias("lid"), "user_id", "ts"),
        ev.select(F.col("event_id").alias("rid"), "user_id", "ts"),
        on="user_id",
        window_sec=3600.0,
    )
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_is_single_exchange(spark):
    """The union+window as-of plan shuffles ONCE (by key) — no join
    operator at all in the physical plan."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df = J.asof_join(
        ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts"),
        ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value"),
        on="user_id",
        value_cols=["value"],
    )
    plan = _plan(df)
    assert "Join" not in plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
