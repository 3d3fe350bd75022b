"""Stream-vs-batch equivalence for the stateful sessionize operator:
the same events split across two micro-batches through
applyInPandasWithState must converge to the exact batch answer
(lag-window + cumulative sum), with state carrying sessions across the
batch boundary."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import Window
from pyspark.sql import functions as F

from crawlspark.streaming.stateful import sessionize_stream

SF = "/root/testdata/sf0.001"
GAP = 1800


def _batch_answer(ev):
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = ev.withColumn(
        "new_s", F.when(gap.isNull() | (gap > GAP), 1).otherwise(0)
    )
    return {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in marked.groupBy("user_id")
        .agg(F.sum("new_s").alias("n_sessions"), F.count("*").alias("n_events"))
        .collect()
    }


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", "ts", "event_id"
    )
    # split into two halves at the global event-time midpoint, so every
    # user's rows arrive in event-time order across micro-batches (the
    # operator's documented ordering contract)
    lo = ev.orderBy("ts", "event_id").limit(int(ev.count() // 2))
    hi = ev.join(lo.select("event_id"), "event_id", "left_anti")
    assert lo.count() + hi.count() == ev.count()

    src = str(tmp_path / "stream_src")
    for i, part in enumerate((lo, hi)):
        part.coalesce(1).write.parquet(f"{src}_stage{i}")
    os.makedirs(src)
    for i in range(2):
        f = glob.glob(f"{src}_stage{i}/*.parquet")[0]
        shutil.copy(f, f"{src}/{i:02d}.parquet")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream, GAP)
        .writeStream.format("memory")
        .queryName("sess_updates")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    updates = spark.sql("select * from sess_updates").collect()
    assert updates, "stateful operator emitted nothing"
    # n_events is strictly monotonic per user across updates → the row
    # with the max n_events IS the final state (emission order in the
    # memory sink is not guaranteed)
    final: dict[int, tuple[int, int]] = {}
    for r in updates:
        u = r["user_id"]
        if u not in final or r["n_events"] > final[u][1]:
            final[u] = (r["n_sessions"], r["n_events"])
    want = _batch_answer(ev)
    assert final == want, {
        u: (final.get(u), want.get(u))
        for u in set(final) | set(want)
        if final.get(u) != want.get(u)
    }
    # the split genuinely crossed the boundary: at least one user got
    # updates in both micro-batches
    from collections import Counter

    per_user_updates = Counter(r["user_id"] for r in updates)
    assert max(per_user_updates.values()) == 2


def test_keep_first_stream_dedup_across_batches(spark, tmp_path):
    """Incremental dedup: a key seen in batch 0 must NOT re-emit when it
    reappears in batch 1; within a batch the min doc_id wins; the
    drained output equals the batch keep-min-id answer."""
    from crawlspark.streaming.stateful import keep_first_stream

    b0 = spark.createDataFrame(
        [(3, "ka"), (1, "ka"), (2, "kb")], ["doc_id", "key"]
    )
    b1 = spark.createDataFrame(
        [(9, "ka"), (5, "kc"), (6, "kc"), (7, "kb")], ["doc_id", "key"]
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, part in enumerate((b0, b1)):
        part.coalesce(1).write.parquet(f"{src}_stage{i}")
        shutil.copy(glob.glob(f"{src}_stage{i}/*.parquet")[0], f"{src}/{i:02d}.parquet")

    stream = (
        spark.readStream.schema(b0.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        keep_first_stream(stream, "key")
        .writeStream.format("memory")
        .queryName("keep_first")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {(r["key"], r["doc_id"]) for r in spark.sql("select * from keep_first").collect()}
    assert got == {("ka", 1), ("kb", 2), ("kc", 5)}
