#!/usr/bin/env python
"""Per-query scale rehearsal: time registry queries at two scale
factors and report the scaling exponent.

For each query, runs the Spark side end-to-end (noop sink — every
column evaluated, nothing collected) at a base dir (default the driver
testdata sf0.1) and a target dir (default the deterministic 10x synth
tables from tools/gen_sf.py), takes the MIN over --reps repetitions
(one-sided host noise can only slow a leg), and prints

    exponent = log(t_big / t_small) / log(scale)

where scale is the row multiple (default 10).  exponent <= 1 means
at-worst-linear scaling; name any query whose exponent lands clearly
above 1 in BENCH.md.

Usage:
    python tools/sf_scale_bench.py [--reps 3] [--scale 10]
        [--small /root/testdata/sf0.1] [--big /root/repo/.sf1data]
        query [query ...]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402
from gbdc_spark.session import get_spark  # noqa: E402


def time_query(fn, spark, sf_dir, reps):
    best = math.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--scale", type=float, default=10.0)
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/root/repo/.sf1data")
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark(
        app_name="sf-scale-bench",
        cores=args.cores,
        shuffle_partitions=args.cores,
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    out = {}
    for name in args.queries:
        fn = qs[name]
        # warm both paths once (JIT/codegen/first-touch storage) before
        # any timed rep so neither leg pays the cold-start alone
        fn(spark, args.small).write.format("noop").mode("overwrite").save()
        fn(spark, args.big).write.format("noop").mode("overwrite").save()
        t_small = time_query(fn, spark, args.small, args.reps)
        t_big = time_query(fn, spark, args.big, args.reps)
        exp = math.log(t_big / t_small) / math.log(args.scale)
        out[name] = {
            "t_small_s": round(t_small, 3),
            "t_big_s": round(t_big, 3),
            "exponent": round(exp, 3),
        }
        print(
            f"{name:32s} small={t_small:7.2f}s big={t_big:7.2f}s "
            f"exponent={exp:+.3f}",
            flush=True,
        )
    print(json.dumps({"scale": args.scale, "reps": args.reps,
                      "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
