"""End-to-end batch pipeline + CLI.

``python -m big_data_engineering_financial_analysis_spark.pipeline --sf-dir ... --out ...`` runs the
full engine flow the reference implements across four services, in one
Spark job:

  1. load candle rows (events-as-candles from the test tables, or any
     candle parquet via --candles);
  2. enrich with the indicator kernel (W1-W7);
  3. write the enriched table date-partitioned (the QuestDB-replacement
     at-rest store, SURVEY K3/K4);
  4. register SQL views and run the serving suite (the Grafana panels),
     printing one JSON line per panel row count.

This is the "switch from the reference to this repo" entry point for batch
workloads; streaming deployments wire the same enrich kernel through
streaming/pipeline.py instead.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession

from big_data_engineering_financial_analysis_spark.plans import dashboard
from big_data_engineering_financial_analysis_spark.functions.indicators import enrich
from big_data_engineering_financial_analysis_spark.sources.parquet import (
    DEFAULT_SF_DIR,
    candles_from_events,
    write_timeseries,
)


def run_batch(
    spark: SparkSession,
    sf_dir: str | None = None,
    candles: DataFrame | None = None,
    out_dir: str | None = None,
    panels: list[str] | None = None,
) -> dict[str, int]:
    """Run the batch pipeline; returns per-panel row counts."""
    if candles is None:
        candles = candles_from_events(spark, sf_dir or DEFAULT_SF_DIR)
    enriched = enrich(candles)
    if out_dir:
        write_timeseries(enriched, os.path.join(out_dir, "stock_data"))
        enriched = spark.read.parquet(os.path.join(out_dir, "stock_data"))
    enriched.createOrReplaceTempView(dashboard.VIEW)
    counts: dict[str, int] = {}
    for panel in panels or list(dashboard.PANEL_SQL):
        counts[panel] = spark.sql(dashboard.PANEL_SQL[panel]).count()
    return counts


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="Run the batch indicator pipeline end-to-end")
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR, help="test-table directory (events as candles)")
    ap.add_argument("--out", default=None, help="optional output dir for the enriched store")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from big_data_engineering_financial_analysis_spark.session import get_spark

    spark = get_spark("bdefa-pipeline", cpus=args.cpus)
    counts = run_batch(spark, sf_dir=args.sf_dir, out_dir=args.out)
    print(json.dumps({"pipeline": "batch", "sf_dir": args.sf_dir, "panel_rows": counts}))
    spark.stop()


if __name__ == "__main__":
    main()
