"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB at
the given sf dir, compares row count, column names/dtypes, and an
order-insensitive value hash (columns sorted by name, rows sorted),
and prints a per-query PASS/FAIL table with first-diff details.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from free_etl_spark.session import get_spark  # noqa: E402
from free_etl_spark.tables import ALL_TABLES  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # canonicalize sequences (list vs ndarray) before str()
            import numpy as np

            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else v
            ).astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if os.environ.get("CHECK_VANILLA"):
        # driver simulation: a session WITHOUT our tuned confs, in a
        # non-UTC timezone — queries must self-provision runtime confs
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check-oracle-vanilla")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc()
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {t_spark:.1f}s)")
            if len(sdf) == 0:
                print(f"     WARNING: zero rows")
            n_pass += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: DUCKDB ERROR {str(e)[:300]}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} duckdb={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols spark={sorted(sdf.columns)} duckdb={sorted(odf.columns)}")
        if not problems:
            s, o = normalize(sdf), normalize(odf)
            sd, od = dict(s.dtypes.astype(str)), dict(o.dtypes.astype(str))
            if sd != od:
                problems.append(f"dtypes spark={sd} duckdb={od}")
            elif not s.equals(o):
                neq = (s != o) & ~(s.isna() & o.isna())
                bad_cols = [c for c in s.columns if neq[c].any()]
                idx = neq.any(axis=1).idxmax()
                problems.append(
                    f"values differ in {bad_cols}; first diff row {idx}: "
                    f"spark={s.loc[idx].to_dict()} duckdb={o.loc[idx].to_dict()}"
                )
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows, {t_spark:.1f}s)")
            if len(sdf) == 0:
                print(f"     WARNING: zero rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()


if __name__ == "__main__":
    main()
