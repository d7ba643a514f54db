"""Does the written-index IVF probe actually PAY vs the in-memory
full-join path?  (The plan audit proves the cell filter reaches
PartitionFilters; this records that the pruning buys wall-clock.)

Legs, interleaved per query so host noise hits both:

* ``ivf_topk`` with a persisted assignment over the source parquet
  table — the best non-written path at scale: the narrow (key, cell)
  assignment is cached, but every query still joins the FULL
  on-disk vector table against the probed cells' keys (a 100-TB
  corpus is never memory-resident, so the source leg reads disk —
  caching it here would benchmark the page cache, not the plan);
* ``ivf_probe`` against an index written with ``ivf_index_write`` —
  reads only the n_probe ``cell=<id>`` directories.

Reports median per-query wall time AND per-query input RECORDS read
(event-log task input metrics; bytes-read stats are not wired for the
local filesystem).  On this host the source table fits in the page
cache, so wall time at this size is job-overhead bound for BOTH legs —
records read is the scale-invariant number: the probe touches
~n_probe/cells of the corpus per query, and at 100 TB that factor IS
the wall-clock/IO factor (no page cache holds the corpus).

The corpus is synthetic (deterministic seeded Gaussians), sized well
past the sf0.1 embeddings table.

Usage: python tools/ivf_probe_bench.py [n_vectors] [dim] [cells]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from gbdc_spark.operators import similarity as sim
from gbdc_spark.session import get_spark


def synth_vectors(spark, n: int, dim: int):
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng(int(i))
                v = rng.standard_normal(dim)
                rows.append({"vec_id": int(i),
                             "embedding": [float(x) for x in v]})
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(
        gen, schema="vec_id long, embedding array<double>"
    )


def records_read_by_leg(log_dir: str) -> dict[str, int]:
    """Sum task-level input Records Read per leg, attributed through
    the job description set before each query's collect."""
    stage_leg: dict[int, str] = {}
    totals: dict[str, int] = {}
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
                if ev.get("Event") == "SparkListenerJobStart":
                    leg = (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )
                    for si in ev.get("Stage Infos", []):
                        stage_leg[si["Stage ID"]] = leg
                elif ev.get("Event") == "SparkListenerTaskEnd":
                    leg = stage_leg.get(ev["Stage ID"], "")
                    im = (ev.get("Task Metrics") or {}).get(
                        "Input Metrics") or {}
                    totals[leg] = totals.get(leg, 0) + int(
                        im.get("Records Read", 0)
                    )
    return totals


def run(n: int = 100_000, dim: int = 64, n_cells: int = 64,
        n_queries: int = 6, k: int = 10, n_probe: int = 2) -> dict:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    log_dir = tempfile.mkdtemp(prefix="ivf_evlog_")
    spark = get_spark(cores=cores, shuffle_partitions=cores,
                      extra={"spark.ui.showConsoleProgress": "false",
                             "spark.eventLog.enabled": "true",
                             "spark.eventLog.dir": log_dir,
                             "spark.eventLog.compress": "false",
                             "spark.eventLog.rolling.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    src = tempfile.mkdtemp(prefix="ivf_src_")
    synth_vectors(spark, n, dim).write.mode("overwrite").parquet(src)
    vecs = spark.read.parquet(src)  # deliberately NOT cached: see header
    cents = sim.centroids_from_rows(vecs, list(range(n_cells)))
    path = tempfile.mkdtemp(prefix="ivf_idx_")
    t0 = time.monotonic()
    sim.ivf_index_write(vecs, cents, path)
    build_s = time.monotonic() - t0
    assigned = sim.ivf_assign(vecs, cents).persist()
    assigned.count()

    queries = [
        [float(x) for x in np.random.default_rng(10_000 + qi).standard_normal(dim)]
        for qi in range(n_queries)
    ]
    full, probe = [], []
    parity = True
    sc = spark.sparkContext
    for q in queries:
        sc.setJobDescription("leg:full")
        t0 = time.monotonic()
        a = sim.ivf_topk(vecs, cents, q, k=k, n_probe=n_probe,
                         assigned=assigned).collect()
        full.append(time.monotonic() - t0)
        sc.setJobDescription("leg:probe")
        t0 = time.monotonic()
        b = sim.ivf_probe(spark, path, cents, q, k=k, n_probe=n_probe).collect()
        probe.append(time.monotonic() - t0)
        sc.setJobDescription(None)
        parity = parity and (
            [r["vec_id"] for r in a] == [r["vec_id"] for r in b]
        )
    spark.stop()
    time.sleep(1.0)
    by_leg = records_read_by_leg(log_dir)
    shutil.rmtree(log_dir, ignore_errors=True)
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(src, ignore_errors=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    return {
        "n_vectors": n, "dim": dim, "cells": n_cells, "n_probe": n_probe,
        "index_build_s": round(build_s, 2),
        "full_join_topk_median_s": round(med(full), 3),
        "pruned_probe_median_s": round(med(probe), 3),
        "wall_speedup": round(med(full) / med(probe), 2),
        "full_records_per_query": by_leg.get("leg:full", 0) // n_queries,
        "probe_records_per_query": by_leg.get("leg:probe", 0) // n_queries,
        "records_read_ratio": round(
            by_leg.get("leg:full", 1) / max(by_leg.get("leg:probe", 1), 1), 1),
        "results_identical": parity,
        "queries": n_queries,
    }


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cells = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    print(json.dumps(run(n, dim, cells), indent=1))
