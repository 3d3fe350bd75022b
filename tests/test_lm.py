"""Bigram-LM perplexity: exact values vs an independent pure-Python
computation of the frozen spec, and the monotonicity a quality filter
relies on (predictable text scores lower perplexity)."""

from __future__ import annotations

import math
import re

from crawlspark.operators import lm as LM

TEXTS = [
    (0, "the cat sat on the mat the cat sat again"),
    (1, "the cat sat on the mat"),
    (2, "zygote quasar bumblebee xylophone"),
    (3, "one"),  # single token -> no bigrams -> omitted
]


def _py_scores(texts):
    tok = lambda t: re.findall(r"[a-z0-9]+", t.lower())  # noqa: E731
    bgs = {i: list(zip(tok(t), tok(t)[1:])) for i, t in texts}
    cab: dict[tuple[str, str], int] = {}
    for pairs in bgs.values():
        for p in pairs:
            cab[p] = cab.get(p, 0) + 1
    ca: dict[str, int] = {}
    for (a, _), c in cab.items():
        ca[a] = ca.get(a, 0) + c
    vocab = {w for _, t in texts for w in tok(t)}
    out = {}
    for i, pairs in bgs.items():
        if not pairs:
            continue
        lnp = [
            math.log(cab[p] + 1) - math.log(ca[p[0]] + len(vocab)) for p in pairs
        ]
        h = round(-sum(lnp) / len(lnp), 6)
        out[i] = (len(pairs), h, round(math.exp(h), 6))
    return out


def test_bigram_lm_matches_hand_computation(spark):
    docs = spark.createDataFrame(TEXTS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"], r["perplexity"])
        for r in LM.bigram_lm_scores(docs).collect()
    }
    assert got == _py_scores(TEXTS)
    assert 3 not in got  # no bigrams -> omitted


def test_predictable_text_scores_lower(spark):
    docs = spark.createDataFrame(TEXTS, ["doc_id", "text"])
    ppl = {
        r["doc_id"]: r["perplexity"] for r in LM.bigram_lm_scores(docs).collect()
    }
    # doc 2's bigrams occur once each with rare contexts -> highest ppl
    # of the corpus (add-one smoothing flattens margins at this scale,
    # so assert ordering, not magnitude)
    assert ppl[2] > ppl[0] and ppl[2] > ppl[1]


def test_pii_scrub_redacts_and_counts(spark):
    from crawlspark.operators import textstats as TS

    rows = [
        (0, "mail me at a.b+c@test.org or backup@x.io thanks"),
        (1, "server 192.168.1.77 and 10.0.0.1 are up"),
        (2, "call +44 20-7946-0958 today"),
        (3, "no pii here at all"),
    ]
    out = {
        r["doc_id"]: r
        for r in TS.pii_scrub(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    }
    assert out[0]["n_email"] == 2 and out[0]["scrubbed_text"] == (
        "mail me at <EMAIL> or <EMAIL> thanks"
    )
    assert out[1]["n_ipv4"] == 2 and out[1]["scrubbed_text"] == (
        "server <IP> and <IP> are up"
    )
    assert out[2]["n_phone"] == 1 and out[2]["scrubbed_text"] == (
        "call <PHONE> today"
    )
    assert out[3]["scrubbed_text"] == "no pii here at all"
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (0, 0, 0)
