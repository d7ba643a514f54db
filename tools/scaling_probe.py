#!/usr/bin/env python
"""Scaling-efficiency evidence (north_rule: efficiency >= 0.8 from N to 4N
executors).

No real cluster exists in this sandbox, so the evidence is the same job —
the flagship feature pipeline (fused hash+58-feature extraction → as-of
join → ffill/lag → sessionize) over the SAME distributed-deterministic
synthetic input — at two parallelism levels (local[8] vs local[32]).
Prints one JSON line per run:

    {"cores": 8, "docs": N, "sec": T, "rows_per_sec": R, "content_hash": H}

``content_hash`` is the sum-fold (mod 2^64) of per-row xxhash64 over the full feature
table: identical hashes at both levels prove bit-identical output under
4x parallelism (float reductions are all per-doc, hence deterministic).

Usage: python tools/scaling_probe.py --cores 8 --docs 20000
       (driver: tools/run_scaling.sh runs both levels and computes efficiency)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from gbdc_spark.operators.checkpoint import content_hash
    from gbdc_spark.plans.flagship import feature_pipeline
    from gbdc_spark.session import get_spark
    from gbdc_spark.sources import tables

    # partitions scale WITH the cluster (4x cores, the standard sizing
    # rule): both levels then run the same ~4 task waves per stage, so
    # single-task jitter is absorbed symmetrically.  The round-1 fixed
    # partition count gave the small level 4 waves but the big level
    # only 1 — any host jitter on one core stalled a whole stage at 4N
    # while averaging out at N, systematically deflating measured
    # efficiency.  (Output hash is partitioning-invariant — verified.)
    # heap scales with cores (1.5 GiB/core): N vs 4N *executors* on a
    # real cluster each bring their own heap, so total memory scales 4x
    # between the levels; a fixed local heap would give the 4N level 4x
    # the task concurrency in the SAME heap — GC pressure the real
    # cluster comparison does not have, systematically deflating
    # measured efficiency (protocol v3, campaign #9 onward).
    spark = get_spark(
        app_name=f"scaling-{args.cores}",
        cores=args.cores,
        shuffle_partitions=max(4 * args.cores, 8),
        extra={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": f"{max(3 * args.cores // 2, 2)}g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # materialize the input ONCE (untimed, reused across runs): the metric
    # is pipeline throughput over a stored table, not generator speed, and
    # both parallelism levels must read byte-identical input
    base = f"/tmp/scaling_input_d{args.docs}_s{args.seed}_x{args.scale}"
    if not os.path.exists(f"{base}/_done"):
        tables.synth_sequences_df(
            spark, args.docs, seed=args.seed, scale=args.scale
        ).repartition(64).write.mode("overwrite").parquet(f"{base}/sequences")
        tables.synth_snapshots_df(spark, args.docs, seed=args.seed).repartition(
            8
        ).write.mode("overwrite").parquet(f"{base}/snapshots")
        open(f"{base}/_done", "w").close()
    seqs = spark.read.parquet(f"{base}/sequences")
    snaps = spark.read.parquet(f"{base}/snapshots")

    # warm up the Python-worker pool + codegen on a small slice so the
    # measured run is steady-state throughput, not JVM startup
    feature_pipeline(
        tables.synth_sequences_df(spark, 256, seed=args.seed),
        tables.synth_snapshots_df(spark, 256, seed=args.seed),
    ).write.format("noop").mode("overwrite").save()

    t0 = time.perf_counter()
    features = feature_pipeline(seqs, snaps)
    # runtime_s is wall-clock measured inside the UDF — the one
    # legitimately non-deterministic column; everything else must hash
    # identically at any parallelism level
    det_cols = [c for c in features.columns if c != "runtime_s"]
    h = content_hash(features, det_cols)
    dt = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "cores": args.cores,
                "docs": args.docs,
                "sec": round(dt, 3),
                "rows_per_sec": round(args.docs / dt, 1),
                "content_hash": h,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
