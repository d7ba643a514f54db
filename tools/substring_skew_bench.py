"""Hot-gram skew bench for substring_dedup (ExactSubstr).

Builds a corpus where ONE l-token gram occurs in half of all documents
(the boilerplate-header regime that would detonate any pair-expanding
design), runs substring_dedup, and reports per-TASK duration skew from
the Spark event log: for every stage of the job, max/median task time.
The min-struct keeper aggregation is map-side combined, so the hot
gram reaches the reduce side as one partial row per map task — the
claim this tool makes repeatable: max/median task time stays within ~2x
even when a gram sits in 50% of docs.

Also prints the hot-stage row evidence: per-partition row counts into
the keeper table (the hot gram is ONE row of it, so counts are flat).

Usage: python tools/substring_skew_bench.py [n_docs] [hot_fraction]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from gbdc_spark.operators.dedup import substring_dedup
from gbdc_spark.session import get_spark

L = 12


def hot_corpus(spark, n_docs: int, hot_fraction: float = 0.5,
               doc_tokens: int = 200):
    """Deterministic: every doc gets unique filler tokens (doc-specific
    offsets, so no accidental cross-doc grams); docs with
    idx % round(1/hot_fraction) == 0 carry THE shared l-gram at a
    doc-dependent position."""
    period = max(1, round(1.0 / hot_fraction))
    hot = np.arange(1, L + 1, dtype=np.int64) * 7  # the boilerplate gram

    def gen(batches):
        for pdf in batches:
            rows = []
            for idx in pdf["id"].tolist():
                base = 1_000_000 + idx * doc_tokens
                toks = np.arange(base, base + doc_tokens, dtype=np.int64)
                if idx % period == 0:
                    pos = (idx // period) % (doc_tokens - L)
                    toks[pos : pos + L] = hot
                rows.append({
                    "doc_id": f"doc{idx:08d}",
                    "tokens": toks.tolist(),
                    "n_tok": int(toks.size),
                    "source": f"src{idx % 8}",
                })
            yield pd.DataFrame(rows)

    return spark.range(n_docs).mapInPandas(
        gen, schema="doc_id string, tokens array<long>, n_tok int, source string"
    )


def task_skew_from_eventlog(log_dir: str) -> list[dict]:
    """Per-stage (max, median) task durations from the event log."""
    stages: dict[tuple, list[float]] = {}
    names: dict[tuple, str] = {}
    paths = []
    for root, _dirs, files in os.walk(log_dir):
        paths += [os.path.join(root, fn) for fn in files
                  if "appstatus" not in fn]
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerTaskEnd":
                    ti = ev["Task Info"]
                    sid = (ev["Stage ID"], ev["Stage Attempt ID"])
                    stages.setdefault(sid, []).append(
                        (ti["Finish Time"] - ti["Launch Time"]) / 1000.0
                    )
                elif ev.get("Event") == "SparkListenerStageSubmitted":
                    si = ev["Stage Info"]
                    names[(si["Stage ID"], si["Stage Attempt ID"])] = si.get(
                        "Stage Name", ""
                    )
    out = []
    for sid, durs in sorted(stages.items()):
        durs.sort()
        med = durs[len(durs) // 2]
        out.append({
            "stage": sid[0],
            "name": names.get(sid, "")[:60],
            "tasks": len(durs),
            "total_s": round(sum(durs), 2),
            "max_s": round(durs[-1], 3),
            "median_s": round(med, 3),
            "ratio": round(durs[-1] / med, 2) if med > 0 else None,
        })
    return out


def run(n_docs: int = 50_000, hot_fraction: float = 0.5) -> dict:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    log_dir = tempfile.mkdtemp(prefix="ssb_evlog_")
    spark = get_spark(
        cores=cores, shuffle_partitions=cores,
        extra={
            "spark.ui.showConsoleProgress": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            # plain single-file json (Spark 4 defaults to rolled+zstd)
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = hot_corpus(spark, n_docs, hot_fraction).repartition(
        cores, "doc_id"
    ).persist()
    n = corpus.count()

    t0 = time.monotonic()
    agg = substring_dedup(corpus, l=L).agg(
        F.sum("n_removed").alias("removed"),
        F.count("*").alias("docs"),
    ).first()
    wall = time.monotonic() - t0

    # row evidence: the keeper table carries the hot gram as ONE row,
    # so per-partition keeper rows are flat regardless of gram df
    grams = corpus.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("tokens") - L),
                lambda p: F.md5(
                    F.concat_ws(",", F.slice(F.col("tokens"), p + 1, L))
                ),
            )
        ).alias("g"),
    )
    keeper_parts = sorted(
        r["c"]
        for r in grams.groupBy("g").agg(F.min("doc_id"))
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid").agg(F.count("*").alias("c")).collect()
    )
    spark.stop()
    time.sleep(1.0)  # let the event log flush on stop

    skew = task_skew_from_eventlog(log_dir)
    # judge the heaviest stages only — tiny stages (a 2-task collect)
    # have meaningless ratios
    heavy = sorted(skew, key=lambda s: -s["total_s"])[:5]
    med_kp = keeper_parts[len(keeper_parts) // 2] if keeper_parts else 0
    return {
        "n_docs": int(n),
        "hot_fraction": hot_fraction,
        "hot_docs": int(n * hot_fraction),
        "removed_tokens": int(agg["removed"]),
        "wall_s": round(wall, 2),
        "keeper_rows_max_over_median": round(
            keeper_parts[-1] / med_kp, 2) if med_kp else None,
        "heavy_stages": heavy,
        "worst_heavy_ratio": max(
            (s["ratio"] or 0) for s in heavy) if heavy else None,
    }


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    hf = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    print(json.dumps(run(n, hf), indent=1))
