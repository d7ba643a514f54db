#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a ``noop``-format write (full
materialization, no driver collect).  The same harness doubles as the
scaling-efficiency probe: run it twice with ``SPARK_GRAFT_CPUS=8`` and
``=32`` on the same input and compare ``flagship_rows_per_sec``
(BASELINE.md protocol; results recorded in BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline subset of __spark_entry__.queries(): the flagship E2E pipeline
# plus one representative per operator family (temporal, relational,
# extraction, dedup, similarity, text).
HEADLINE = [
    "flagship_pipeline",
    "asof_join",
    "sessionize",
    "trailing_agg",
    "q1_pricing",
    "q3_segment_revenue",
    "base_features_docs",
    "gbdhash_docs",
    "dedup_exact",
    "minhash_pairs",
    "cosine_topk",
    "text_stats",
    "sessionize_scalable",
    "gate_features_docs",
    "ngram_jaccard",
]


def _force(df) -> None:
    """Materialize every row exactly once (no driver collect)."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from gbdc_spark.session import get_spark

    from __spark_entry__ import queries

    spark = get_spark(app_name="gbdc-bench", cores=CPUS)
    qs = queries()

    # warm the JVM, the Python-worker pool, Arrow serialization, and the
    # cogroup/window codegen once so per-query numbers measure the
    # pipeline, not session startup (the flagship on the smoke SF touches
    # every machinery the headline queries use).
    qs["q1_pricing"](spark, SF_DIR).count()
    _force(qs["flagship_pipeline"](spark, "/root/testdata/sf0.001"))

    timings: dict[str, float] = {}
    flagship_rows = 0
    flagship_sec = 0.0
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        _force(df)
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        if name == "flagship_pipeline":
            # throughput metric is input sequences/sec through the full
            # hash+features+asof+window pipeline, not output group rows
            flagship_rows = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
            flagship_sec = dt

    out = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": CPUS,
        "flagship_rows": flagship_rows,
        "flagship_rows_per_sec": round(flagship_rows / flagship_sec, 1) if flagship_sec else None,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
