"""Structured Streaming facade (SURVEY.md §7, optional layer).

The core crawl loop is iterated batch by design — the reference's loop is
a synchronous frontier drain. Streaming enters at two seams:

1. **Seed ingest**: a file stream of URL lists (one URL per line dropped
   into a watch directory) feeds the engine's admission sub-DAG per
   micro-batch via ``foreachBatch`` — exactly how a production frontier
   accepts new seed feeds while crawling.
2. **Crawl telemetry**: a parquet stream over the engine's append-only
   ``completed`` delta directory, watermarked tumbling-window counts per
   status — the monitoring surface.

Both run with ``Trigger.AvailableNow`` in tests (drain-and-stop), and
unmodified as continuous streams in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def seed_ingest_stream(
    spark: SparkSession,
    watch_dir: str,
    engine,
    checkpoint_dir: str,
):
    """readStream(text) → per-micro-batch admission into the engine
    frontier. Returns the StreamingQuery (caller awaits/stops)."""
    lines = spark.readStream.format("text").load(watch_dir)

    def admit_batch(batch_df: DataFrame, batch_id: int) -> None:
        urls = [r["value"].strip() for r in batch_df.collect() if r["value"].strip()]
        if not urls:
            return
        cands = spark.createDataFrame(
            [(u, 0, "seed", -1, i, 0) for i, u in enumerate(urls)],
            ["raw_url", "depth", "src", "parent_seq", "link_pos", "sub_pos"],
        ).withColumn("parent_seq", F.col("parent_seq").cast("long"))
        engine._admit(cands)
        engine._checkpoint_state()

    return (
        lines.writeStream.foreachBatch(admit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def crawl_telemetry_stream(
    spark: SparkSession,
    completed_delta_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    sink: str = "parquet",
    query_name: str = "crawl_telemetry",
):
    """Watermarked windowed status counts over the append-only completed
    deltas (the engine's per-round output files ARE a stream source).

    Production: ``sink='parquet'`` + append mode — windows emit as the
    watermark passes them across micro-batches. One-shot drains
    (availableNow tests) can't advance the watermark past a window, so
    tests use ``sink='memory'`` + complete mode."""
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(completed_delta_dir)
        .withColumn("event_time", F.current_timestamp())
    )
    agg = (
        src.withWatermark("event_time", "10 seconds")
        .groupBy(F.window("event_time", "5 seconds"), F.col("status"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("win_start"),
            "status",
            "n",
        )
    )
    if sink == "memory":
        return (
            agg.writeStream.format("memory")
            .queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
    return (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
