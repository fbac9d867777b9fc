"""Capture .explain("formatted") for registry queries into plans/<round>/.

Usage:
    PYTHONPATH=/root/repo python tools/capture_plans.py --tag before \
        --out plans/r12 [--queries a,b,c]

Plan SHAPE is scale-invariant; the default sf-dir is sf0.001 so building
the frames is cheap (eager probe aggregates still run, but tiny).  Every
captured file is <query>_<tag>.txt under --out.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    # headline tier (bench.py HEADLINE_FAMILIES)
    "enrich_indicators", "summarize_multiple", "feature_windows",
    "last_per_minute", "pricing_summary", "shipping_priority",
    "local_supplier_volume", "top_orders", "event_type_stats",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "ann_bruteforce", "ann_lsh", "ann_ivf", "text_quality",
    "sessionize", "trailing_time_avg",
    # most expensive extras (BENCH_r11)
    "adx_dmi", "dedup_incremental", "sharpe_rolling",
    "dedup_clusters_incremental", "xsec_momentum", "token_budget_mix",
    "heikin_ashi", "ichimoku", "nation_volume_flow", "summarize",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="plans/r12")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default=None,
                    help="comma-separated; default = headline + hot extras")
    args = ap.parse_args()

    from big_data_engineering_financial_analysis_spark import get_spark
    from big_data_engineering_financial_analysis_spark.plans.registry import QUERIES

    names = args.queries.split(",") if args.queries else DEFAULT_QUERIES
    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("capture-plans")
    for name in names:
        df = QUERIES[name](spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
