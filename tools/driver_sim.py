"""Driver simulation — drive the engine exactly as the round driver does.

Vanilla SparkSession (NOT get_spark: the driver builds its own, so this
path is what proves conf-independence, e.g. the nanos-timestamp fix),
entry() smoke check, then per-query Spark-vs-DuckDB oracle compare at
sf0.01 with the driver-strict canonicalization from tests/test_oracle.py.

Usage::

    python tools/driver_sim.py                 # full registry sweep
    python tools/driver_sim.py name1 name2 ... # only these queries
    python tools/driver_sim.py --first-50      # the driver's window
"""

from __future__ import annotations

import sys
import time

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main(argv: list[str]) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    sys.path.insert(0, "/root/repo")
    from tests.test_oracle import canonicalize

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    # 1. entry smoke
    rows = e.entry(spark)
    n = rows.count()
    print(f"entry(): {n} rows, schema: {[f.name for f in rows.schema.fields]}")
    assert n >= 0

    queries = e.queries()
    oracles = e.oracle_sql()
    names = [a for a in argv if not a.startswith("--")]
    if "--first-50" in argv:
        names = list(queries)[:50]
    elif not names:
        names = list(queries)

    failed: list[str] = []
    for name in names:
        if name not in queries:
            print(f"{name}: NOT IN REGISTRY")
            failed.append(name)
            continue
        t0 = time.time()
        try:
            spark_df = queries[name](spark, SF).toPandas()
            spark.catalog.clearCache()
            if name not in oracles:
                status = f"rows-only ({len(spark_df)} rows)"
                if len(spark_df) == 0:
                    failed.append(name)
                    status = "FAIL rows-only: 0 rows"
                print(f"{name}: {status} [{time.time()-t0:.1f}s]")
                continue
            oracle_df = duck.execute(oracles[name]).fetchdf()
            ok_rows = len(spark_df) == len(oracle_df)
            ok_cols = sorted(spark_df.columns) == sorted(oracle_df.columns)
            a, b = canonicalize(spark_df), canonicalize(oracle_df)
            ok_hash = ok_rows and ok_cols and a.equals(b)
            if ok_hash:
                print(f"{name}: MATCH ({len(spark_df)} rows) [{time.time()-t0:.1f}s]")
            else:
                failed.append(name)
                print(
                    f"{name}: MISMATCH rows={ok_rows} cols={ok_cols} "
                    f"spark={len(spark_df)} oracle={len(oracle_df)}"
                )
                if ok_rows and ok_cols:
                    mism = (a != b).any(axis=1)
                    idx = mism[mism].index[:3]
                    print(f"  spark:\n{a.loc[idx]}\n  oracle:\n{b.loc[idx]}")
        except Exception as ex:  # noqa: BLE001 — report and continue the sweep
            failed.append(name)
            print(f"{name}: ERROR {type(ex).__name__}: {ex}")
    print(f"\n{len(names) - len(failed)}/{len(names)} MATCH; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
