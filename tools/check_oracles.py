"""Driver-mimic harness: run every queries() entry against its
oracle_sql() in DuckDB at a given SF and compare row-count, column set,
and order-insensitive values.  Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402
from gbdc_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
        elif s.dtype == object:
            df[c] = s.map(lambda x: str(sorted(x)) if isinstance(x, (list, np.ndarray)) else x)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("float64")  # unify int32/int64 for comparison
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark = get_spark(app_name="check-oracles", cores=8, shuffle_partitions=8,
                      extra={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {str(e).splitlines()[0][:140]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows, {len(got.columns)} cols (rows-only)")
            if len(got) == 0 and name != "minhash_pairs":
                failures.append(name)
                print(f"FAIL  {name}: zero rows")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {str(e).splitlines()[0][:140]}")
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(g)} vs {len(w)}")
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, rtol=1e-6, atol=1e-9)
            print(f"OK    {name}: {len(g)} rows")
        except AssertionError as e:
            failures.append(name)
            diff = (g != w)
            bad_cols = [c for c in g.columns if diff[c].any()]
            print(f"FAIL  {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                idx = diff[c].idxmax()
                print(f"      {c}[{idx}]: spark={g[c][idx]!r} duck={w[c][idx]!r}")
    spark.stop()
    print("\n%d failures" % len(failures), sorted(failures) if failures else "")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
