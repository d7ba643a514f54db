"""Dev harness: run __spark_entry__ queries against their DuckDB oracles
with driver-style canonicalization (sort columns by name, sort rows,
compare values + dtypes).  Usage:

    python tools/oracle_compare.py [sf_dir] [query ...]

No args = every query that has an oracle.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    a, b = canon(spark_pdf), canon(oracle_pdf)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        problems.append(f"rows differ: spark={len(a)} oracle={len(b)}")
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            problems.append(f"dtype[{c}]: spark={a[c].dtype} oracle={b[c].dtype}")
    if not problems:
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if a[c].dtype == object:
                eq = pd.Series(av).fillna("\0").eq(pd.Series(bv).fillna("\0")).all()
            elif np.issubdtype(a[c].dtype, np.floating):
                eq = np.allclose(av, bv, rtol=0, atol=0, equal_nan=True)
            else:
                eq = (av == bv).all()
            if not eq:
                bad = next(
                    i for i in range(len(av))
                    if not (av[i] == bv[i] or (pd.isna(av[i]) and pd.isna(bv[i])))
                )
                problems.append(
                    f"values[{c}] differ, first at row {bad}: "
                    f"spark={av[bad]!r} oracle={bv[bad]!r}"
                )
    return problems


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E
    from gbdc_spark.session import get_spark

    qs, osql = E.queries(), E.oracle_sql()
    names = sys.argv[2:] or [n for n in qs if n in osql]

    spark = get_spark(cores=8, shuffle_partitions=8,
                      extra={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_fail = 0
    for name in names:
        if name not in osql:
            print(f"{name}: NO ORACLE")
            continue
        try:
            s = qs[name](spark, sf_dir).toPandas()
            o = con.execute(osql[name]).df()
            problems = compare(name, s, o)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION {type(e).__name__}: {str(e)[:400]}"]
        if problems:
            n_fail += 1
            print(f"{name}: FAIL")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"{name}: ok ({len(s)} rows)")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
