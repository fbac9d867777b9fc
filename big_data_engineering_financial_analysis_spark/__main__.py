"""CLI runner: execute any registry query from the command line.

    python -m big_data_engineering_financial_analysis_spark <query> [--sf-dir DIR]
        [--limit N] [--explain] [--list]

A user of the reference interacts through ad-hoc queries (Grafana panels,
the REST API, psql against QuestDB); this is the engine-native
equivalent: every named query in the driver contract, runnable one-shot.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="big_data_engineering_financial_analysis_spark",
        description="Run a named registry query and print the result.",
    )
    ap.add_argument("query", nargs="?", help="registry query name")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="directory with the parquet tables",
    )
    ap.add_argument("--limit", type=int, default=20, help="rows to show")
    ap.add_argument(
        "--explain", action="store_true", help="print the formatted plan instead"
    )
    ap.add_argument(
        "--oracle",
        action="store_true",
        help="print the query's DuckDB oracle SQL instead (no Spark session)",
    )
    ap.add_argument("--list", action="store_true", help="list query names")
    args = ap.parse_args(argv)

    from big_data_engineering_financial_analysis_spark.plans.registry import ORACLES, QUERIES

    if args.list or not args.query:
        for name in QUERIES:
            print(name)
        return 0
    if args.query not in QUERIES:
        print(f"unknown query {args.query!r} (use --list)", file=sys.stderr)
        return 2
    if args.oracle:
        sql = ORACLES.get(args.query)
        if sql is None:
            print(f"{args.query} has no oracle (rows-only check)", file=sys.stderr)
            return 1
        print(sql)
        return 0

    from big_data_engineering_financial_analysis_spark import get_spark

    spark = get_spark(f"cli:{args.query}")
    try:
        df = QUERIES[args.query](spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        else:
            # one execution only: collect limit+1 to know whether rows
            # were truncated without a second full run for an exact count
            rows = df.limit(args.limit + 1).collect()
            shown = rows[: args.limit]
            spark.createDataFrame(shown, df.schema).show(
                args.limit, truncate=False
            )
            more = " (more rows exist)" if len(rows) > args.limit else ""
            print(f"(showing {len(shown)} rows{more})")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
