"""Infinite-trap detection — the engine's FROZEN spec (SURVEY.md §2.7).

The reference calls ``is_infinite_trap(url) -> (bool, pattern)`` pre-fetch
(/root/reference/crawler/worker.py:74-79, scraper.py:105-107) but the
function is missing from the snapshot. This module is the engine-defined,
deterministic, fully column-expression replacement (no UDF):

  T1 repeat_segment : any path segment occurring >= 3 times
  T2 deep_path      : > 10 non-empty path segments
  T3 calendar       : >= 2 year path segments (/YYYY/) OR a
                      (year|month|day|date|calendar|event)=<digits> query key
  T4 query_explosion: > 5 query params, or any repeated query key
  T5 session_key    : sid/sessionid/phpsessid/jsessionid/utm_* query keys
  T6 long_url       : len(url) > 300

First matching rule (T1..T6 order) names the pattern; non-trap → NULL.
A pure-Python twin (``is_infinite_trap``) backs the conformance oracle.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawlspark.functions import urls as U

# RE2-safe (no lookahead — the DuckDB oracle twin runs on RE2): count
# '/YYYY/' year segments; >= 2 distinct date-ish runs marks a calendar trap.
_CAL_SEG = r"/(19|20)\d\d/"
_CAL_QUERY = r"(^|&)(year|month|day|date|calendar|event)=\d"
_SESSION_QUERY = r"(^|&)(sid|sessionid|phpsessid|jsessionid|utm_[a-z0-9_]*)="
MAX_PATH_DEPTH = 10
MAX_QUERY_PARAMS = 5
MAX_URL_LEN = 300
REPEAT_SEGMENT_N = 3


def _segments(path: Column) -> Column:
    return F.filter(F.split(path, "/"), lambda s: s != "")


def _query_keys(query: Column) -> Column:
    return F.transform(
        F.filter(F.split(query, "&"), lambda kv: kv != ""),
        lambda kv: F.substring_index(kv, "=", 1),
    )


def trap_pattern(url: Column) -> Column:
    """Nullable string column: first matching trap rule name, else NULL."""
    p = U.path(url)
    q = F.lower(U.query(url))
    segs = _segments(p)
    keys = _query_keys(q)
    repeat_seg = F.exists(
        segs, lambda s: F.size(F.filter(segs, lambda x: x == s)) >= REPEAT_SEGMENT_N
    )
    deep = F.size(segs) > MAX_PATH_DEPTH
    calendar = (
        F.size(F.regexp_extract_all(p, F.lit(_CAL_SEG), 0)) >= 2
    ) | q.rlike(_CAL_QUERY)
    explosion = (F.size(keys) > MAX_QUERY_PARAMS) | (
        F.size(keys) != F.size(F.array_distinct(keys))
    )
    session = q.rlike(_SESSION_QUERY)
    long_url = F.length(url) > MAX_URL_LEN

    return (
        F.when(repeat_seg, F.lit("repeat_segment"))
        .when(deep, F.lit("deep_path"))
        .when(calendar, F.lit("calendar"))
        .when(explosion, F.lit("query_explosion"))
        .when(session, F.lit("session_key"))
        .when(long_url, F.lit("long_url"))
    )


def is_trap(url: Column) -> Column:
    return trap_pattern(url).isNotNull()


# ---------------------------------------------------------------------------
# pure-Python twin — used by the conformance oracle and property tests
# ---------------------------------------------------------------------------

_CAL_SEG_RE = re.compile(_CAL_SEG)
_CAL_QUERY_RE = re.compile(_CAL_QUERY)
_SESSION_RE = re.compile(_SESSION_QUERY)


def is_infinite_trap(url: str) -> tuple[bool, str | None]:
    """Same signature as the reference's missing function
    (ref crawler/worker.py:74-79)."""
    from urllib.parse import urlparse

    parsed = urlparse(url)
    p, q = parsed.path, parsed.query.lower()
    segs = [s for s in p.split("/") if s]
    keys = [kv.split("=", 1)[0] for kv in q.split("&") if kv]
    if any(segs.count(s) >= REPEAT_SEGMENT_N for s in segs):
        return True, "repeat_segment"
    if len(segs) > MAX_PATH_DEPTH:
        return True, "deep_path"
    if len(_CAL_SEG_RE.findall(p)) >= 2 or _CAL_QUERY_RE.search(q):
        return True, "calendar"
    if len(keys) > MAX_QUERY_PARAMS or len(keys) != len(set(keys)):
        return True, "query_explosion"
    if _SESSION_RE.search(q):
        return True, "session_key"
    if len(url) > MAX_URL_LEN:
        return True, "long_url"
    return False, None
