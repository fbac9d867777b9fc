"""Isolated min/median-of-N timing for named registry queries.

Bench-identical methodology (get_spark, noop force), one warm-up run per
query, then N timed runs; cache cleared between queries, not between a
query's own runs (bench families share caches the same way).

    PYTHONPATH=/root/repo python tools/isolated_timing.py [-n 3] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from big_data_engineering_financial_analysis_spark import get_spark
    from big_data_engineering_financial_analysis_spark.plans.registry import QUERIES

    spark = get_spark("isolated-timing")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, args.sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return round(time.perf_counter() - t0, 3)

    out = {}
    for name in args.queries:
        run(name)  # warm-up: plan compile + JIT
        obs = sorted(run(name) for _ in range(args.n))
        out[name] = {"min": obs[0], "med": obs[len(obs) // 2], "obs": obs}
        spark.catalog.clearCache()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
