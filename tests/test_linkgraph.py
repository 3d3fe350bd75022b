"""PageRank (operators/linkgraph.py) and adaptive recrawl scheduling
(operators/schedule.py:recrawl_priority)."""

from __future__ import annotations

import pytest

from crawlspark.operators.linkgraph import pagerank
from crawlspark.operators.schedule import recrawl_priority


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _numpy_pagerank(pairs, n_iter, damping=0.85):
    """Independent replica of the documented recurrence (round-12 per
    iteration, round-6 final), computed with plain Python dicts."""
    e = sorted(set(pairs))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)
    outdeg = {}
    for u, _ in e:
        outdeg[u] = outdeg.get(u, 0) + 1
    rank = {v: round(1.0 / n, 12) for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        mass = {v: 0.0 for v in nodes}
        for u, v in e:
            mass[v] += rank[u] / outdeg[u]
        rank = {v: round(base + damping * mass[v], 12) for v in nodes}
    return {v: round(r, 6) for v, r in rank.items()}


def test_pagerank_cycle_uniform(spark):
    # a 4-cycle is rank-regular: everyone stays at exactly 1/N
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1)]
    out = {r["id"]: r["rank"] for r in pagerank(_edges(spark, pairs), n_iter=5).collect()}
    assert out == {1: 0.25, 2: 0.25, 3: 0.25, 4: 0.25}


def test_pagerank_star_matches_replica(spark):
    # hub-and-spoke with a dangling hub target and a multi-edge (deduped)
    pairs = [(1, 5), (2, 5), (3, 5), (4, 5), (5, 1), (1, 2), (1, 2)]
    out = {r["id"]: r["rank"] for r in pagerank(_edges(spark, pairs), n_iter=6).collect()}
    expect = _numpy_pagerank(pairs, n_iter=6)
    assert out == expect
    assert out[5] == max(out.values())  # the hub dominates


def test_pagerank_materialize_equivalent(spark):
    pairs = [(i, (i * 3) % 7 + 1) for i in range(1, 8)] + [(7, 1), (2, 6)]
    a = {r["id"]: r["rank"] for r in pagerank(_edges(spark, pairs), n_iter=6).collect()}
    b = {
        r["id"]: r["rank"]
        for r in pagerank(_edges(spark, pairs), n_iter=6, materialize_every=2).collect()
    }
    assert a == b


def test_pagerank_reuses_cached_edges(spark):
    # the edge table must be read from cache inside the iteration loop —
    # the big-table shuffle happens once, not per iteration
    pairs = [(1, 2), (2, 3), (3, 1)]
    plan = pagerank(_edges(spark, pairs), n_iter=3)._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan


def test_pagerank_empty(spark):
    out = pagerank(_edges(spark, []), n_iter=3)
    assert out.count() == 0
    assert out.columns == ["id", "rank"]


def test_pagerank_rejects_zero_iters(spark):
    with pytest.raises(ValueError):
        pagerank(_edges(spark, [(1, 2)]), n_iter=0)


def test_recrawl_priority_semantics(spark):
    rows = [
        # page a: 4 fetches, hash changes twice -> rate 2/3
        ("a", 1, "h1"), ("a", 2, "h1"), ("a", 3, "h2"), ("a", 4, "h3"),
        # page b: 2 fetches, never changes -> rate 0, max backoff
        ("b", 1, "x"), ("b", 2, "x"),
        # page c: single fetch -> rate 0 (no refetch evidence)
        ("c", 9, "y"),
    ]
    df = spark.createDataFrame(rows, "url string, ts long, content_hash string")
    out = {r["url"]: r for r in recrawl_priority(df, order_col=None).collect()}
    assert out["a"]["n_fetches"] == 4 and out["a"]["n_changes"] == 2
    assert out["a"]["change_rate"] == round(2 / 3, 6)
    assert out["a"]["next_interval_hours"] == round(24.0 / (0.05 + round(2 / 3, 6)), 4)
    assert out["b"]["change_rate"] == 0.0
    assert out["b"]["next_interval_hours"] == 480.0  # 24 / 0.05
    assert out["c"]["n_changes"] == 0 and out["c"]["change_rate"] == 0.0


def test_schedule_round_priority_order(spark):
    from crawlspark.operators.schedule import schedule_round

    rows = [
        # (domain, seq, url_hash, priority) — d1: seq order says a,b,c but
        # priority says c first; d2 ties on priority -> seq breaks it
        ("d1", 10, 1, 5.0), ("d1", 11, 2, 3.0), ("d1", 12, 3, 1.0),
        ("d2", 20, 4, 2.0), ("d2", 21, 5, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "registered_domain string, discovery_seq long, "
              "url_hash long, prio double")

    fifo = schedule_round(df, 1)
    assert {(r["registered_domain"], r["discovery_seq"]) for r in fifo.collect()} \
        == {("d1", 10), ("d2", 20)}

    pri = schedule_round(df, 1, order_col="prio")
    assert {(r["registered_domain"], r["discovery_seq"]) for r in pri.collect()} \
        == {("d1", 12), ("d2", 20)}

    pri2 = schedule_round(df, 2, order_col="prio")
    assert {(r["registered_domain"], r["discovery_seq"]) for r in pri2.collect()} \
        == {("d1", 12), ("d1", 11), ("d2", 20), ("d2", 21)}
