"""Property-based tests (SURVEY.md §5.5, hypothesis)."""

from __future__ import annotations

from urllib.parse import urlparse

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawlspark.functions import traps
from crawlspark.functions.simhash import simhash_counter
from crawlspark.operators.badurls import jaccard_py, sim_tokens_py

_path_seg = st.text(
    alphabet="abcdefghij0123456789-_.%", min_size=0, max_size=8
)
_urls = st.builds(
    lambda host, segs, query, frag, slash: (
        "https://" + host + "/" + "/".join(segs)
        + ("?" + query if query else "")
        + ("/" if slash else "")
        + ("#" + frag if frag else "")
    ),
    host=st.sampled_from(["a.com", "sub.b.co.uk", "x-y.example", "localhost"]),
    segs=st.lists(_path_seg, max_size=6),
    query=st.text(alphabet="abk=&123_", max_size=12),
    frag=st.text(alphabet="abc", max_size=4),
    slash=st.booleans(),
)


@settings(max_examples=200, deadline=None)
@given(_urls)
def test_canonicalize_idempotent(url):
    def canon(u):
        import re

        return re.sub("#.*$", "", u).rstrip("/")

    assert canon(canon(url)) == canon(url)


@settings(max_examples=200, deadline=None)
@given(_urls)
def test_trap_twin_total(url):
    # the python trap twin never raises and returns a stable verdict
    a = traps.is_infinite_trap(url)
    b = traps.is_infinite_trap(url)
    assert a == b


@settings(max_examples=100, deadline=None)
@given(_urls)
def test_sim_tokens_self_jaccard_is_one(url):
    t = sim_tokens_py(url)
    if t:
        assert jaccard_py(t, t) == 1.0


@settings(max_examples=50, deadline=None)
@given(st.dictionaries(st.text(alphabet="abcdef", min_size=1, max_size=6), st.integers(1, 5), max_size=10))
def test_simhash_deterministic_and_bounded(counts):
    a = simhash_counter(counts)
    assert a == simhash_counter(counts)
    assert -(2**63) <= a < 2**63


def test_trap_spark_python_agreement_random(spark):
    import random

    rng = random.Random(99)
    urls = []
    for _ in range(120):
        segs = [rng.choice(["x", "y", "2020", "05", "a-b", "p1"]) for _ in range(rng.randint(0, 12))]
        q = "&".join(
            rng.choice(["a=1", "utm_source=t", "year=2020", "b=2", "sid=9", "a=3"])
            for _ in range(rng.randint(0, 7))
        )
        urls.append("https://h.example/" + "/".join(segs) + ("?" + q if q else ""))
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = dict(df.select("url", traps.trap_pattern(F.col("url")).alias("p")).collect())
    for u in urls:
        is_t, pat = traps.is_infinite_trap(u)
        assert got[u] == (pat if is_t else None), u
