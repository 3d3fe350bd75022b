#!/usr/bin/env python
"""Regenerate the multimodal value goldens (tests/goldens/*.json) after
an INTENTIONAL kernel/query change. Uses the exact snapshot canon the
golden test applies, so a regen followed by pytest is self-consistent.

    python scripts/regen_goldens.py [query ...]     # default: all four
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E
from crawlspark.session import get_spark
from tests.test_multimodal_goldens import GOLDEN_DIR, QUERIES, SF_DIR, snapshot


def main() -> None:
    names = sys.argv[1:] or QUERIES
    spark = get_spark("regen-goldens", master="local[8]")
    qs = E.queries()
    for name in names:
        snap = snapshot(qs[name](spark, SF_DIR))
        path = os.path.join(GOLDEN_DIR, f"{name}.json")
        with open(path, "w") as f:
            json.dump(snap, f, indent=1, sort_keys=True)
        print(f"wrote {path}: {len(snap['rows'])} rows")


if __name__ == "__main__":
    main()
