"""Driver simulation per .claude/skills/verify — vanilla SparkSession drive.

Runs entry() smoke, then every queries() entry vs its oracle_sql() in DuckDB
at sf0.01 with driver-strict canonicalization (floats via repr, -0.0 kept).

Usage: python tests/driver_sim.py [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if pd.isna(v):
            return "<null>"
        if isinstance(v, float):
            return repr(float(v))
        return str(v)

    out = df.map(cell)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    print(f"entry(): {len(rows)} rows OK")

    from big_data_engineering_financial_analysis_spark.sources.parquet import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    queries, oracles = e.queries(), e.oracle_sql()
    only = set(sys.argv[1:])
    fails = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF).toPandas()
            spark.catalog.clearCache()
            if name not in oracles:
                print(f"{name}: ROWS-ONLY ({len(sdf)} rows)")
                continue
            odf = con.execute(oracles[name]).fetchdf()
            if len(sdf) != len(odf):
                print(f"{name}: MISMATCH rows {len(sdf)} != {len(odf)}")
                fails += 1
                continue
            if sorted(sdf.columns) != sorted(odf.columns):
                print(f"{name}: MISMATCH cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
                fails += 1
                continue
            a, b = canonicalize(sdf), canonicalize(odf)
            mism = (a != b).any(axis=1)
            if mism.any():
                idx = mism[mism].index[:3]
                print(f"{name}: MISMATCH {int(mism.sum())}/{len(a)} rows")
                print("spark:\n", a.loc[idx].to_string())
                print("oracle:\n", b.loc[idx].to_string())
                fails += 1
            else:
                print(f"{name}: MATCH ({len(a)} rows)")
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERROR {type(ex).__name__}: {ex}")
            fails += 1
    print(f"\n{'FAIL' if fails else 'PASS'}: {fails} failures / {len(only) or len(queries)} checked")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
