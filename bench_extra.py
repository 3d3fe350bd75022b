#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): noop-sink timing + plan capture.

NOT the frozen driver bench — bench.py is the measured artifact. This
harness exists so a single query can be timed without the sink/count
shortcut ambiguity and its ``explain("formatted")`` captured for
plans/r06/. Usage:

  python bench_extra.py <query> [...]            # time with noop sink
  python bench_extra.py --explain-dir plans/r06 --suffix before <query> ...
  python bench_extra.py --count <query>          # time the bench's .count()

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS,
BENCH_EXTRA_REPEATS (default 2).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E
from crawlspark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--count", action="store_true",
                    help="time .count() (the frozen bench's action) instead of the noop sink")
    ap.add_argument("--no-time", action="store_true", help="only capture plans")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeats = int(os.environ.get("BENCH_EXTRA_REPEATS", "2"))
    spark = get_spark("crawlspark-bench-extra", master=f"local[{cpus}]")
    qs = E.queries()
    out: dict[str, list[float]] = {}
    loadavg = [round(x, 2) for x in os.getloadavg()]
    for name in args.queries:
        fn = qs[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        if args.no_time:
            continue
        runs = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            if args.count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 2))
            spark.sparkContext.setJobDescription(None)
        out[name] = runs
    print(json.dumps({"sf_dir": sf_dir, "mode": "count" if args.count else "noop",
                      "loadavg_at_launch": loadavg, "runs": out}))


if __name__ == "__main__":
    main()
