"""Bucketed-table co-located joins: plan-asserted Exchange elimination.

With broadcast disabled (so a small dim can't hide the shuffle), a join
between two tables bucketed to the same count on the join key must plan
a SortMergeJoin with ZERO Exchange nodes; one-side bucketing must leave
exactly one Exchange (the unbucketed side). Values must equal the plain
join either way.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F

from crawlspark.operators.bucketing import write_bucketed

SF = "/root/testdata/sf0.001"


@contextlib.contextmanager
def _no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_both_sides_bucketed_join_is_exchange_free(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    bo = write_bucketed(orders, "t_orders_b", "o_orderkey", 8, str(tmp_path / "o"))
    bl = write_bucketed(li, "t_lineitem_b", "l_orderkey", 8, str(tmp_path / "l"))
    with _no_broadcast(spark):
        joined = bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"])
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        got = joined.count()
    # values equal the plain (shuffled) join
    expect = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).count()
    assert got == expect and got > 0


def test_one_side_bucketed_join_shuffles_only_the_other(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    bo = write_bucketed(orders, "t_orders_b1", "o_orderkey", 8, str(tmp_path / "o1"))
    with _no_broadcast(spark):
        joined = bo.join(li, bo["o_orderkey"] == li["l_orderkey"])
        plan = _plan(joined)
        assert plan.count("Exchange") == 1, plan
        assert joined.count() > 0


def test_bucketed_groupby_on_bucket_key_is_exchange_free(spark, tmp_path):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    bl = write_bucketed(li, "t_lineitem_b2", "l_orderkey", 8, str(tmp_path / "l2"))
    agg = bl.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    shuffled = (
        li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty")).collect()
    )
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, shuffled))
