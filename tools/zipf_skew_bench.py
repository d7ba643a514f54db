"""Straggler-tail bench for the auto size-rebalance gate.

Builds a deterministic Zipf-heavy corpus (doc sizes ~ Pareto via inverse
CDF on a hashed index — a few giants, a long tail of small docs), runs
the fused extractor with rebalance off vs auto, and reports wall time
plus the per-partition work tail (max/median of summed per-doc
runtime_s, captured with spark_partition_id on the extractor output —
mapInPandas preserves partitioning, so the id reflects the partition
that did the work).

Usage: python tools/zipf_skew_bench.py [n_docs] [alpha]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from gbdc_spark.operators.extract import extract_all
from gbdc_spark.session import get_spark


def zipf_corpus(spark, n_docs: int, alpha: float = 1.05, min_tok: int = 60,
                cap: int = 300_000):
    """Deterministic: doc idx -> uniform u -> Pareto size; tokens are a
    repeating clause pattern of that length."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for idx in pdf["id"].tolist():
                u = ((idx * 2654435761 + 12345) % (2**31)) / float(2**31)
                size = int(min(min_tok * (1.0 - u) ** (-1.0 / alpha), cap))
                lits = np.tile(np.asarray([1, -2, 3, 0], dtype=np.int32), size // 4 + 1)[:size]
                if lits[-1] != 0:
                    lits = np.concatenate([lits, np.zeros(1, np.int32)])
                rows.append({
                    "doc_id": f"doc{idx:08d}",
                    "tokens": lits.tolist(),
                    "n_tok": int(lits.size),
                    "source": f"src{idx % 8}",
                })
            yield pd.DataFrame(rows)

    return spark.range(n_docs).mapInPandas(
        gen, schema="doc_id string, tokens array<int>, n_tok int, source string"
    )


def run(n_docs: int = 20_000, alpha: float = 1.05, rounds: int = 2) -> dict:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cores=cores, shuffle_partitions=cores,
                      extra={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: pay JVM/Arrow/codegen startup outside the measured legs
    extract_all(zipf_corpus(spark, 500, alpha), rebalance=False).count()
    # materialize the corpus ONCE: otherwise the auto leg's probe/range
    # sampling re-runs the generator and the measurement mixes generation
    # with extraction
    corpus = zipf_corpus(spark, n_docs, alpha).repartition(cores, "doc_id").persist()
    corpus.count()

    def leg(rebalance):
        t0 = time.monotonic()
        per_part = (
            extract_all(corpus, rebalance="auto" if rebalance else False)
            .select(F.spark_partition_id().alias("pid"), "runtime_s")
            .groupBy("pid")
            .agg(F.sum("runtime_s").alias("work"))
            .collect()
        )
        wall = time.monotonic() - t0
        work = sorted(r["work"] for r in per_part)
        med = work[len(work) // 2] if work else 0.0
        return {
            "wall_s": round(wall, 2),
            "partitions": len(work),
            "work_max_s": round(work[-1], 2) if work else 0.0,
            "work_median_s": round(med, 3),
            "tail_ratio": round(work[-1] / med, 1) if med else None,
        }

    # deterministic load-balance evidence (no timing noise): per-doc
    # extraction cost is ~linear in tokens, so the per-partition token
    # totals ARE the work distribution striping equalizes
    from gbdc_spark.operators.partitioning import size_bucketed

    def token_balance(df):
        parts = sorted(
            r["t"] for r in df.select(F.spark_partition_id().alias("pid"), "n_tok")
            .groupBy("pid").agg(F.sum("n_tok").alias("t")).collect()
        )
        med = parts[len(parts) // 2]
        return {"max_tokens": parts[-1], "median_tokens": med,
                "tail_ratio": round(parts[-1] / med, 2)}

    balance = {"hash": token_balance(corpus),
               "striped": token_balance(size_bucketed(corpus))}

    out = {"hash": [], "auto": []}
    for _ in range(rounds):  # interleaved so host noise hits both modes
        out["hash"].append(leg(False))
        out["auto"].append(leg(True))
    spark.stop()
    best = {m: min(rs, key=lambda r: r["work_max_s"]) for m, rs in out.items()}
    return {"balance": balance, "best": best, "rounds": out}


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    a = float(sys.argv[2]) if len(sys.argv) > 2 else 1.2
    import json

    print(json.dumps({"n_docs": n, "alpha": a, **run(n, a)}))
