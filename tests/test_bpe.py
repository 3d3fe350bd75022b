"""Distributed BPE trainer vs its pure-Python twin (frozen tie-break:
count desc, then (left, right) asc; greedy left-to-right merge
application). The twin pins VALUES for the rows-only driver query."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from crawlspark.operators import bpe as B

TEXTS = [
    "the lower lowest lowly low low lower newest newer new news",
    "wider wide widest width the the these those that nest nests",
    "low low low lower lower newest newest newest newest wide wide",
    "aaa aaab baaa the thee theme tree three threes 123 1234 12345",
]


def _wc(texts):
    wc: dict[str, int] = {}
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_bpe_train_matches_python_twin(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    twin = B.bpe_train_python(_wc(TEXTS), n_merges=20)
    # both the driver-gated path (default threshold) and the forced
    # DISTRIBUTED loop (threshold=0) must equal the twin byte-for-byte
    for thresh in (200_000, 0):
        out = (
            B.bpe_train(docs, n_merges=20, driver_vocab_threshold=thresh)
            .orderBy("rank")
            .collect()
        )
        assert [(r["left"], r["right"], r["weight"]) for r in out] == twin, thresh
        # ranks are dense from 0 and merged = left || right
        assert [r["rank"] for r in out] == list(range(len(out)))
        assert all(r["merged"] == r["left"] + r["right"] for r in out)


def test_bpe_greedy_overlap_and_min_count():
    # 'aaaa' under merge (a,a): greedy left-to-right pairs as (aa)(aa),
    # so the next round counts the (aa,aa) pair — the classic BPE edge
    wc = {"aaaa": 3}
    merges = B.bpe_train_python(wc, n_merges=3, min_count=2)
    assert merges[0] == ("a", "a", 9)  # 3 adjacent pairs x weight 3
    # after (a,a): word = [aa, aa, </w>] — pairs (aa,aa) and (aa,</w>)
    # tie at 3; frozen tie-break is lexicographic and '<' < 'a'
    assert merges[1] == ("aa", B.EOW, 3)
    assert merges[2] == ("aa", "aa" + B.EOW, 3)
    # min_count stops training: a pair seen once never merges
    assert B.bpe_train_python({"ab": 1}, n_merges=5, min_count=2) == []


def test_bpe_encode_matches_python_twin(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    merges = [(l, r) for l, r, _ in B.bpe_train_python(_wc(TEXTS), n_merges=12)]
    got = {
        r["doc_id"]: (r["n_words"], r["n_chars_tok"], r["n_bpe_tokens"])
        for r in B.bpe_encode(docs, merges).collect()
    }
    for i, t in enumerate(TEXTS):
        words = re.findall(r"[a-z0-9]+", t.lower())
        enc = B.bpe_encode_python(words, merges)
        n_chars = sum(len(w) + 1 for w in words)
        assert got[i] == (len(words), n_chars, len(enc)), i
        assert len(enc) < n_chars  # merges actually compress


def test_bpe_apply_merge_fold_greedy(spark):
    # the JVM-side fold matches the twin's greedy scan on overlaps
    df = spark.createDataFrame([(["a", "a", "a", "b"],)], ["syms"])
    got = df.select(B._apply_merge(F.col("syms"), "a", "a").alias("m")).first()["m"]
    assert got == ["aa", "a", "b"]


def test_bpe_batched_paths_identical_and_sane(spark):
    """batch_size>1 (VERDICT r4 #5): the distributed loop, the driver
    fast path, and the pure-Python twin must stay bit-identical under
    batching; batch acceptance only takes symbol-disjoint merges per
    pass; batch_size=1 reproduces sequential training exactly."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    twin = B.bpe_train_python(_wc(TEXTS), n_merges=24, batch_size=4)
    for thresh in (200_000, 0):
        out = (
            B.bpe_train(
                docs, n_merges=24, driver_vocab_threshold=thresh, batch_size=4
            )
            .orderBy("rank")
            .collect()
        )
        assert [(r["left"], r["right"], r["weight"]) for r in out] == twin, thresh
    assert len(twin) == 24

    # batch_size=1 == the classic sequential twin
    assert B.bpe_train_python(_wc(TEXTS), n_merges=20, batch_size=1) == (
        B.bpe_train_python(_wc(TEXTS), n_merges=20)
    )

    # acceptance rule: within one batch no accepted merge touches an
    # earlier accepted merge's left/right/merged symbols
    ranked = [("a", "b", 100), ("b", "c", 90), ("x", "y", 80), ("ab", "q", 70)]
    taken = B._accept_batch(ranked, 4, min_count=1)
    assert taken == [("a", "b", 100), ("x", "y", 80)]
    # min_count stops the walk
    assert B._accept_batch([("a", "b", 1)], 4, min_count=2) == []
