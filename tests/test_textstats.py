"""Unit tests for the corpus-hygiene text operators
(operators/textstats.py): decontamination, repetition signals,
stopword scrub, per-source dup rollup, and the approx-quantile gate."""

from __future__ import annotations

import pytest

from crawlspark.operators import textstats as TS


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_decontaminate_planted_copy(spark):
    bench = _docs(spark, [(0, "one two three four five six seven")])
    train = _docs(
        spark,
        [
            # verbatim copy of the bench doc → every 5-gram hits
            (1, "one two three four five six seven"),
            # shares a single 5-gram window
            (2, "zz one two three four five yy xx ww vv"),
            # disjoint vocabulary → absent from the output
            (3, "alpha beta gamma delta epsilon zeta eta"),
        ],
    )
    rows = {r["doc_id"]: r for r in TS.decontaminate(train, bench, n=5).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["n_hit"] == rows[1]["n_shingles"] == 3
    assert rows[1]["hit_frac"] == 1.0
    assert rows[2]["n_hit"] == 1


def test_decontaminate_min_overlap(spark):
    bench = _docs(spark, [(0, "one two three four five six seven")])
    train = _docs(spark, [(2, "zz one two three four five yy xx ww vv")])
    assert TS.decontaminate(train, bench, n=5, min_overlap=2).count() == 0


def test_repetition_stats_handcrafted(spark):
    df = _docs(
        spark,
        [
            (1, "a a a b"),      # 4 tokens, 2 distinct; bigrams: aa aa ab
            (2, "solo"),          # single token → no bigrams
            (3, "x y x y x y"),  # top bigram "x y" covers 3/5
        ],
    )
    rows = {r["doc_id"]: r for r in TS.repetition_stats(df).collect()}
    assert rows[1]["n_tokens"] == 4
    assert rows[1]["distinct_frac"] == 0.5
    assert rows[1]["top_word_frac"] == 0.75
    assert rows[1]["top_bigram_frac"] == round(2 / 3, 6)
    assert rows[2]["n_tokens"] == 1
    assert rows[2]["top_bigram_frac"] == 0.0
    assert rows[3]["top_bigram_frac"] == 0.6


def test_repetition_stats_drops_empty_docs(spark):
    df = _docs(spark, [(1, "real words here"), (2, "   "), (3, "")])
    assert [r["doc_id"] for r in TS.repetition_stats(df).collect()] == [1]


def test_scrub_stopwords(spark):
    df = _docs(spark, [(1, "The cat AND the hat!"), (2, "a an the")])
    rows = {r["doc_id"]: r for r in TS.scrub_stopwords(df).collect()}
    assert rows[1]["clean_text"] == "cat hat"
    assert rows[1]["n_removed"] == 3
    assert rows[2]["clean_text"] == ""
    assert rows[2]["n_removed"] == 3


def test_source_dup_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "same text", "s1", 9),
            (2, "same text", "s1", 9),
            (3, "other", "s1", 5),
            (4, "unique", "s2", 6),
        ],
        ["doc_id", "text", "source", "n_chars"],
    )
    rows = {r["source"]: r for r in TS.source_dup_stats(df).collect()}
    assert rows["s1"]["n_docs"] == 3 and rows["s1"]["n_unique"] == 2
    assert rows["s1"]["dup_frac"] == round(1 - 2 / 3, 6)
    assert rows["s2"]["dup_frac"] == 0.0
    assert rows["s1"]["avg_chars"] == round((9 + 9 + 5) / 3, 6)


def test_approx_quantiles_rank_error(spark):
    """The sketch quantile must land within 2% empirical rank of its
    target for every (event_type, q) — the gate that stands in for the
    missing SQL oracle (same contract as the HLL approx_distinct gate)."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.01"
    rows = E.q_approx_quantiles(spark, sf).collect()
    assert len(rows) > 0
    vals = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("event_type", "value")
        .collect()
    )
    by_type: dict[str, list[float]] = {}
    for r in vals:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for r in rows:
        xs = sorted(by_type[r["event_type"]])
        n = len(xs)
        for q, col in ((0.5, "p50_apx"), (0.9, "p90_apx"), (0.99, "p99_apx")):
            apx = r[col]
            rank = sum(1 for x in xs if x <= apx) / n
            assert abs(rank - q) <= 0.02, (r["event_type"], q, apx, rank)


def test_image_quality_gate_boundaries(spark):
    from crawlspark.operators.multimodal import image_quality_gate

    cap = "five words of caption text"
    rows = [
        (1, 128, 128, cap),        # exactly at min side → kept
        (2, 127, 500, cap),        # one px short → dropped
        (3, 384, 128, cap),        # aspect exactly 3.0 → kept
        (4, 385, 128, cap),        # aspect just over 3 → dropped
        (5, 200, 200, "too short"),  # 2-token caption → dropped
    ]
    df = spark.createDataFrame(rows, ["image_id", "w", "h", "caption"])
    out = {r["image_id"]: r for r in image_quality_gate(df).collect()}
    assert set(out) == {1, 3}
    assert out[3]["aspect"] == 3.0
    assert out[1]["mpx"] == round(128 * 128 / 1e6, 6)
    assert out[1]["n_caption_tokens"] == 5
