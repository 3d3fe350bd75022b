#!/usr/bin/env python
"""Run every __spark_entry__.queries() entry against its oracle_sql() twin
(DuckDB) and compare row count, column names, and values — approximating
the driver's correctness gate. Usage:

    python scripts/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as E
from crawlspark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_type(t: str) -> str:
    """Canonicalize a Spark simpleString / DuckDB type string to a shared tag.

    The driver's correctness gate hashes values *with their arrow types*, so
    a DuckDB HUGEINT (from sum over INTEGER) vs Spark BIGINT diverges even
    when values are identical. Mirror that strictness here.
    """
    t = t.strip().lower()
    if t.endswith("[]"):
        return f"list<{canon_type(t[:-2])}>"
    if t.startswith("array<") and t.endswith(">"):
        return f"list<{canon_type(t[6:-1])}>"
    m = {
        "bigint": "i64", "long": "i64",
        "integer": "i32", "int": "i32",
        "smallint": "i16", "tinyint": "i8",
        "hugeint": "i128", "ubigint": "u64", "uinteger": "u32",
        "double": "f64", "float": "f32", "real": "f32",
        "varchar": "str", "string": "str", "text": "str",
        "boolean": "bool", "date": "date",
        "blob": "bytes", "binary": "bytes",
    }
    if t in m:
        return m[t]
    if t.startswith("decimal"):
        return t.replace(" ", "")
    if t.startswith("timestamp"):
        return "ts"
    return t


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-oracles", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs, osql = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_types = {f.name.lower(): canon_type(f.dataType.simpleString())
                       for f in sdf.schema.fields}
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in osql:
            print(f"ok   {name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(osql[name])
            d_cols = [c.lower() for c in rel.columns]
            d_types = {c: canon_type(str(t)) for c, t in zip(d_cols, rel.types)}
            d_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            continue
        ok = True
        if sorted(c.lower() for c in s_cols) != sorted(d_cols):
            ok = False
            print(f"FAIL {name}: columns spark={s_cols} duckdb={d_cols}")
        elif s_types != d_types:
            ok = False
            bad = {c: (s_types.get(c), d_types.get(c))
                   for c in set(s_types) | set(d_types)
                   if s_types.get(c) != d_types.get(c)}
            print(f"FAIL {name}: dtype mismatch (spark, duckdb): {bad}")
        elif len(s_rows) != len(d_rows):
            ok = False
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        else:
            ks, kd = rows_key(s_rows, [c.lower() for c in s_cols]), rows_key(d_rows, d_cols)
            if ks != kd:
                ok = False
                diff = [(a, b) for a, b in zip(ks, kd) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diff}")
        if ok:
            print(f"ok   {name}: {len(s_rows)} rows match ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries pass")
    if failures:
        print("failures:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main()
