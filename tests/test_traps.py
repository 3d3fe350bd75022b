"""Trap spec (SURVEY.md §2.7) — table-driven + Spark/Python twin equality."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlspark.functions import traps

CASES = [
    ("https://a.com/wiki/page", None),
    ("https://a.com/x/y/x/z/x", "repeat_segment"),
    ("https://a.com/" + "/".join(f"s{i}" for i in range(11)), "deep_path"),
    ("https://a.com/2023/05/2023/06", "repeat_segment"),  # repeat wins (2023 twice... no, 2023 twice = 2 < 3) -> check below
    ("https://a.com/blog/2021/03/2022/04", "calendar"),
    ("https://a.com/p?year=2024", "calendar"),
    ("https://a.com/p?a=1&b=2&c=3&d=4&e=5&f=6", "query_explosion"),
    ("https://a.com/p?a=1&a=2", "query_explosion"),
    ("https://a.com/p?utm_source=x", "session_key"),
    ("https://a.com/p?PHPSESSID=abc", "session_key"),
    ("https://a.com/" + "x" * 300, "deep_path_or_long"),  # placeholder, fixed below
]
# fix rows that need care
CASES[3] = ("https://a.com/2023/05/2024/06", "calendar")
CASES[10] = ("https://a.com/" + "a" * 300, "long_url")


def test_python_twin_table():
    for url, want in CASES:
        is_t, pat = traps.is_infinite_trap(url)
        assert (pat if is_t else None) == want, url


def test_spark_matches_python_twin(spark):
    urls = [u for u, _ in CASES] + [
        "https://a.com/a/b/a/b/a",
        "https://a.com/p?sid=1",
        "https://a.com/p?x=1&y=2",
        "https://a.com/events?date=20240101",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = dict(
        df.select("url", traps.trap_pattern(F.col("url")).alias("p")).collect()
    )
    for u in urls:
        is_t, pat = traps.is_infinite_trap(u)
        assert got[u] == (pat if is_t else None), u
