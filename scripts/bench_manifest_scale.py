#!/usr/bin/env python
"""Two-level manifest scale bench (VERDICT r4 #7 'Done' criterion):
commit a table of N data files (default 10^4, written directly with
pyarrow — no Spark) and measure, for the grouped layout vs the
single-level (inline) layout:

  - snapshot load (latest(): parse the top manifest — the resume hot
    path; grouped parses O(groups) refs, inline parses O(files) entries)
  - full entry access (files(): inline is free, grouped opens groups)
  - append commit cost (add 10 files: grouped+reuse re-reads only the
    new dir's footers and rewrites only the tail group; the single-level
    layout re-serializes every entry into the snapshot JSON)

Usage: python scripts/bench_manifest_scale.py [n_files] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

import crawlspark.icelite.table as TB
from crawlspark.icelite import IceliteCatalog


def make_files(dirp: str, n: int, start: int = 0) -> None:
    os.makedirs(dirp, exist_ok=True)
    for i in range(n):
        t = pa.table(
            {
                "url_hash": pa.array([start + i], pa.int64()),
                "discovery_seq": pa.array([start + i], pa.int64()),
            }
        )
        pq.write_table(t, os.path.join(dirp, f"part-{start + i:06d}.parquet"))


def bench(n_files: int, group_size: int) -> dict:
    TB.GROUP_SIZE = group_size
    root = tempfile.mkdtemp(prefix="manifbench_")
    try:
        cat = IceliteCatalog(os.path.join(root, "cat"))
        base = os.path.join(root, "base")
        t0 = time.monotonic()
        make_files(base, n_files)
        t_mk = time.monotonic() - t0

        t0 = time.monotonic()
        cat.commit({"t": [base]}, meta={})
        t_commit = time.monotonic() - t0

        # fresh catalog instance = cold caches (the resume path)
        t0 = time.monotonic()
        cat2 = IceliteCatalog(os.path.join(root, "cat"))
        snap = cat2.latest()
        t_latest = time.monotonic() - t0

        t0 = time.monotonic()
        entries = cat2.files(snap, "t")
        t_files = time.monotonic() - t0
        assert len(entries) == n_files

        extra = os.path.join(root, "extra")
        make_files(extra, 10, start=n_files)
        t0 = time.monotonic()
        cat2.commit({"t": [base, extra]}, meta={})
        t_append = time.monotonic() - t0

        manifest_bytes = os.path.getsize(
            os.path.join(
                cat2.root, "manifests",
                f"snapshot-{cat2.latest().snapshot_id:06d}.json",
            )
        )
        return {
            "n_files": n_files,
            "group_size": group_size,
            "grouped": n_files > group_size,
            "mk_files_sec": round(t_mk, 3),
            "commit_sec": round(t_commit, 3),
            "latest_sec": round(t_latest, 4),
            "files_accessor_sec": round(t_files, 4),
            "append_10_files_sec": round(t_append, 3),
            "snapshot_json_bytes": manifest_bytes,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    out = {
        "loadavg_at_launch": list(os.getloadavg()),
        "two_level": bench(n, 1000),
        # single-level baseline: same code, grouping disabled
        "single_level": bench(n, 1 << 40),
    }
    tl, sl = out["two_level"], out["single_level"]
    out["latest_speedup"] = round(
        sl["latest_sec"] / max(tl["latest_sec"], 1e-9), 1
    )
    out["append_speedup"] = round(
        sl["append_10_files_sec"] / max(tl["append_10_files_sec"], 1e-9), 1
    )
    dest = sys.argv[2] if len(sys.argv) > 2 else None
    if dest:
        with open(dest, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
