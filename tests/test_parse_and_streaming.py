"""HTML parse operator (P1/P2 reference semantics) + streaming facade."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from crawlspark.operators.parse import extract_links_and_text, parse_html_py

HTML = """
<html><head><script>var a = '<a href="/no">x</a>';</script>
<style>.x { color: red }</style></head>
<body>
<header><a href="/header-link">H</a>skip this text</header>
<nav><a href="/nav-link">N</a></nav>
<p>Hello <b>world</b>, this is the body text.</p>
<a href="/rel/page">rel</a>
<a href="https://other.com/abs">abs</a>
<a name="no-href">anchor-without-href</a>
<div><a href="../up">up</a></div>
<footer><a href="/footer-link">F</a>footer text</footer>
</body></html>
"""


def test_parse_html_py_reference_semantics():
    links, text = parse_html_py("https://a.com/dir/page.html", HTML)
    # header/footer/nav links dropped (scraper.py:60-61)
    assert "https://a.com/header-link" not in links
    assert "https://a.com/footer-link" not in links
    assert "https://a.com/nav-link" not in links
    # body links absolutized with urljoin (scraper.py:64-68)
    assert "https://a.com/rel/page" in links
    assert "https://other.com/abs" in links
    assert "https://a.com/up" in links
    # script/style and dropped subtrees excluded from text (scraper.py:71-74)
    assert "Hello" in text and "body text" in text
    assert "var a" not in text and "color: red" not in text
    assert "skip this text" not in text and "footer text" not in text


def test_extract_links_and_text_spark(spark):
    df = spark.createDataFrame(
        [("https://a.com/dir/page.html", HTML.encode())], ["url", "content"]
    )
    row = extract_links_and_text(df).collect()[0]
    links, text = parse_html_py("https://a.com/dir/page.html", HTML)
    assert row["links"] == links
    assert row["text"] == text


def test_seed_ingest_stream(spark, tmp_path):
    from crawlspark import corpus as C
    from crawlspark.config import CrawlConfig
    from crawlspark.engine import CrawlEngine
    from crawlspark.streaming.ingest import seed_ingest_stream

    d = str(tmp_path / "corpus")
    C.write_corpus(d, C.CorpusSpec(n_pages=40, n_domains=5, seed=3))
    cfg = CrawlConfig(allowed_url_patterns=C.ALLOWED_PATTERNS)
    eng = CrawlEngine(spark, cfg, d, str(tmp_path / "state"), checkpoint_interval=100)
    eng.start(resume=False)
    n0 = eng.pending.count()

    watch = tmp_path / "watch"
    watch.mkdir()
    # two new seed URLs not yet in the frontier
    import pyarrow.parquet as pq

    urls = pq.read_table(f"{d}/pages.parquet").column("canonical_url").to_pylist()
    fresh = [u for u in urls if "/wiki/" in u][-2:]
    (watch / "feed1.txt").write_text("\n".join(fresh) + "\n")

    q = seed_ingest_stream(spark, str(watch), eng, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    n1 = eng.pending.count()
    assert n1 >= n0  # admitted (some may have been seeded already)
    admitted = {r["url"] for r in eng.pending.select("url").collect()}
    for u in fresh:
        assert u.rstrip("/") in admitted or u in admitted


def test_telemetry_stream(spark, tmp_path):
    from crawlspark.engine import COMPLETED_SCHEMA
    from crawlspark.streaming.ingest import crawl_telemetry_stream

    delta_dir = tmp_path / "completed"
    delta_dir.mkdir()
    rows = [
        ("https://a.com/1", 1, None, "a.com", "a.com", "/1", 0, "seed", 1, 0,
         "parsed", 1, 10, 8),
        ("https://a.com/2", 2, None, "a.com", "a.com", "/2", 0, "seed", 2, 0,
         "error", 1, None, None),
    ]
    spark.createDataFrame(rows, COMPLETED_SCHEMA).write.parquet(
        str(delta_dir / "d000000")
    )
    out = tmp_path / "out"
    q = crawl_telemetry_stream(
        spark, str(delta_dir / "*"), str(out), str(tmp_path / "ckpt2"),
        COMPLETED_SCHEMA, sink="memory", query_name="telem_test",
    )
    q.awaitTermination(120)
    res = spark.sql("select * from telem_test")
    got = {(r["status"], r["n"]) for r in res.collect()}
    assert ("parsed", 1) in got and ("error", 1) in got


def test_telemetry_stream_replay_deterministic(spark, tmp_path):
    """Event time derives from completed_round, so replaying the SAME
    deltas (fresh checkpoint, later wall-clock) yields byte-identical
    window rows — the replayable-telemetry contract (VERDICT r3 #6)."""
    import time

    from crawlspark.engine import COMPLETED_SCHEMA
    from crawlspark.streaming.ingest import crawl_telemetry_stream

    delta_dir = tmp_path / "completed"
    delta_dir.mkdir()
    rows = [
        ("https://a.com/1", 1, None, "a.com", "a.com", "/1", 0, "seed", 1, 0,
         "parsed", 1, 10, 8),
        ("https://a.com/2", 2, None, "a.com", "a.com", "/2", 0, "seed", 2, 0,
         "error", 3, None, None),
        ("https://a.com/3", 3, None, "a.com", "a.com", "/3", 0, "seed", 3, 0,
         "parsed", 9, 12, 9),
    ]
    spark.createDataFrame(rows, COMPLETED_SCHEMA).write.parquet(
        str(delta_dir / "d000000")
    )

    def drain(tag: str):
        q = crawl_telemetry_stream(
            spark, str(delta_dir / "*"), str(tmp_path / f"out_{tag}"),
            str(tmp_path / f"ckpt_{tag}"), COMPLETED_SCHEMA,
            sink="memory", query_name=f"telem_{tag}",
        )
        q.awaitTermination(120)
        return sorted(
            (str(r["win_start"]), r["status"], r["n"])
            for r in spark.sql(f"select * from telem_{tag}").collect()
        )

    first = drain("r1")
    time.sleep(1.5)  # different wall-clock; same data
    second = drain("r2")
    assert first == second
    # rounds 1-3 land in the round-derived window [0s, 5s), round 9 in
    # [5s, 10s) — window assignment follows the DATA, not arrival time
    starts = {s for s, _, _ in first}
    assert len(starts) == 2
    by_win = {(s, st): n for s, st, n in first}
    assert sum(n for (s, st), n in by_win.items() if st == "parsed") == 2
    assert sum(n for (s, st), n in by_win.items() if st == "error") == 1


def test_stream_stream_join_granularity_invariant(spark, tmp_path):
    """attribution_join_stream drains to the batch-join answer at every
    micro-batch granularity: 4 one-file triggers vs one big trigger vs
    the plain batch join all yield the same pair set, and the watermark +
    time-range condition registers a bounded state operator."""
    from crawlspark.streaming.ingest import (
        attribution_join_stream,
        stage_micro_batches,
    )

    sf = "/root/testdata/sf0.001"
    ev = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"),
                "user_id", "event_type")
    )
    sides = {
        kind: stage_micro_batches(
            ev.filter(F.col("event_type") == kind).select(
                "event_id", "ts", "user_id"
            ),
            ["ts", "event_id"],
            str(tmp_path),
            sub=f"src_{kind}",
            n_parts=4,
        )
        for kind in ("view", "click")
    }

    schema = "event_id long, ts timestamp, user_id long"

    def drain(tag, files_per_trigger):
        views = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(sides["view"])
        )
        clicks = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(sides["click"])
        )
        q = (
            attribution_join_stream(views, clicks, horizon_s=3600)
            .writeStream.format("memory")
            .queryName(f"ssj_{tag}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        prog = q.lastProgress
        rows = sorted(
            (r["view_id"], r["click_id"], r["user_id"], r["lag_s"])
            for r in spark.sql(f"select * from ssj_{tag}").collect()
        )
        return rows, prog

    fine, prog_fine = drain("fine", 1)
    coarse, _ = drain("coarse", 8)
    assert fine == coarse
    # batch twin
    v, c = ev.filter("event_type='view'").alias("v"), ev.filter(
        "event_type='click'"
    ).alias("c")
    batch = sorted(
        (r["view_id"], r["click_id"], r["user_id"], r["lag_s"])
        for r in v.join(
            c,
            F.expr("v.user_id = c.user_id and c.ts >= v.ts "
                   "and c.ts <= v.ts + interval 3600 seconds"),
        ).select(
            F.col("v.event_id").alias("view_id"),
            F.col("c.event_id").alias("click_id"),
            F.col("v.user_id").alias("user_id"),
            (F.unix_timestamp("c.ts") - F.unix_timestamp("v.ts")).alias("lag_s"),
        ).collect()
    )
    assert fine == batch
    assert len(fine) > 0
    # a stateful symmetric-hash-join operator ran (state is being kept
    # and expired by the watermark, not an unbounded buffer)
    ops = (prog_fine or {}).get("stateOperators", [])
    assert any("symmetricHashJoin" in (op.get("operatorName") or "") for op in ops), ops
