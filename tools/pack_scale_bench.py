"""Heavy-source packing A/B: plain pack_next_fit vs the two-phase
chunked pack_next_fit_scalable on a corpus with FEW heavy sources —
the regime the scalable variant exists for.

With ``sources`` groups, the plain operator is exactly ``sources``
pandas tasks each materializing rows/sources rows (at 100 TB: an OOM);
the chunked variant runs hundreds of bounded (source, chunk) tasks.
This records that the scalable shape also pays WALL-CLOCK on 32 cores
(parallelism sources -> cores) and verifies both outputs bit-identical
on the run data.

Usage: python tools/pack_scale_bench.py [n_docs] [sources]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F

from gbdc_spark.operators.packing import pack_next_fit, pack_next_fit_scalable
from gbdc_spark.session import get_spark

MAX_TOKENS = 2048


def corpus(spark, n_docs: int, sources: int):
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame({
                "doc_id": [f"doc{int(i):09d}" for i in ids],
                "source": [f"src{int(i) % sources}" for i in ids],
                # deterministic pseudo-random sizes 1..600
                "n_tok": [(int(i) * 2654435761 % 600) + 1 for i in ids],
            })

    return spark.range(n_docs).mapInPandas(
        gen, schema="doc_id string, source string, n_tok int"
    )


def run(n_docs: int = 1_000_000, sources: int = 4, rounds: int = 2) -> dict:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cores=cores, shuffle_partitions=cores,
                      extra={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    df = corpus(spark, n_docs, sources).repartition(cores, "doc_id").persist()
    df.count()

    agg = [F.count("*").alias("rows"), F.max("pack_id").alias("max_pack"),
           F.sum(F.xxhash64("doc_id", "pack_id", "pack_fill")
                 .cast("decimal(38,0)")).alias("fold")]

    def leg(fn, **kw):
        t0 = time.monotonic()
        row = fn(df, MAX_TOKENS, **kw).agg(*agg).first()
        return time.monotonic() - t0, (int(row["rows"]),
                                       int(row["max_pack"]), int(row["fold"]))

    # ids are 'doc' + 9 digits, so a 9-char prefix is 'doc' + the first
    # 6 digits = 1000-doc chunks (prefix 6 would be 'doc'+3 digits =
    # 10^6-doc chunks — barely any chunking below a few million rows)
    out = {"plain": [], "scalable": []}
    sigs = set()
    for _ in range(rounds):
        w, s = leg(pack_next_fit)
        out["plain"].append(round(w, 2)); sigs.add(s)
        w, s = leg(pack_next_fit_scalable, chunk_prefix=9)
        out["scalable"].append(round(w, 2)); sigs.add(s)
    spark.stop()
    assert len(sigs) == 1, f"outputs diverged: {sigs}"
    best = {m: min(v) for m, v in out.items()}
    return {
        "n_docs": n_docs, "sources": sources, "max_tokens": MAX_TOKENS,
        "plain_best_s": best["plain"], "scalable_best_s": best["scalable"],
        "speedup": round(best["plain"] / best["scalable"], 2),
        "outputs_identical": True, "rounds": out,
    }


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    print(json.dumps(run(n, s), indent=1))
