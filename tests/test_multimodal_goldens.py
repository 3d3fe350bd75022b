"""Value-level gates for the four rows-only multimodal driver queries
(VERDICT r2 #8): the kernels are deterministic pure functions, so their
full sf0.001 outputs are pinned as JSON goldens in-repo. The driver's
correctness gate can only check row counts for these (no SQL twin); this
test is the value gate."""

from __future__ import annotations

import hashlib
import json
import math
import os

import pytest

import __spark_entry__ as E

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
SF_DIR = "/root/testdata/sf0.001"
QUERIES = ["payload_phash", "payload_resize", "video_frames", "audio_features"]


def canon(v):
    """JSON-stable canonical form: binaries hashed, floats rounded."""
    if isinstance(v, (bytes, bytearray)):
        return "md5:" + hashlib.md5(bytes(v)).hexdigest()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return [canon(x) for x in v]
    return v


def snapshot(df):
    cols = sorted(df.columns)
    rows = [[canon(r[c]) for c in cols] for r in df.collect()]
    rows.sort(key=json.dumps)
    return {"columns": cols, "rows": rows}


@pytest.mark.parametrize("name", QUERIES)
def test_multimodal_query_matches_golden(spark, name):
    got = snapshot(E.queries()[name](spark, SF_DIR))
    path = os.path.join(GOLDEN_DIR, f"{name}.json")
    with open(path) as f:
        want = json.load(f)
    assert got["columns"] == want["columns"]
    assert len(got["rows"]) == len(want["rows"])
    assert got["rows"] == want["rows"]
