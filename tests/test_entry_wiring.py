"""Driver-contract wiring gates (no Spark session needed): every oracle
key and bench-headline entry must point at a real queries() entry, so a
rename in one place can't silently break the driver's correctness gate
or the bench."""

from __future__ import annotations

import __spark_entry__ as E
import bench


def test_oracle_keys_subset_of_queries():
    qs, osql = set(E.queries()), set(E.oracle_sql())
    missing = osql - qs
    assert not missing, f"oracle_sql keys without a query: {sorted(missing)}"


def test_bench_headline_subset_of_queries():
    qs = set(E.queries())
    missing = set(bench.HEADLINE_QUERIES) - qs
    assert not missing, f"bench headline without a query: {sorted(missing)}"
    assert len(bench.HEADLINE_QUERIES) == len(set(bench.HEADLINE_QUERIES))


def test_rows_only_queries_are_the_documented_set():
    """Queries without an oracle are a deliberate, documented contract
    (iterative or pandas-UDF payload ops) — additions must be conscious."""
    qs, osql = set(E.queries()), set(E.oracle_sql())
    rows_only = qs - osql
    assert rows_only == {
        "payload_phash",
        "payload_resize",
        "video_frames",
        "audio_features",
        "phash_neardup",
        "ann_ivf_trained",
        "approx_distinct",
        "approx_quantiles",
        "bpe_train",
        "bpe_train_256",
        "bpe_encode",
    }, sorted(rows_only)
