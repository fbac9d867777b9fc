"""Round-7 bisect step 1: isolated re-measurement of the two queries the
round-6 bench showed regressing with no code change (VERDICT r6 ask #1).

Runs each query 5x on a fresh-ish session (one canary warm-up, cache
cleared between queries), prints all observations + min, vs the r5/r6
recorded figures.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAMES = sys.argv[1:] or ["countmin_topk", "dedup_semantic"]

from big_data_engineering_financial_analysis_spark import get_spark
from big_data_engineering_financial_analysis_spark.plans.registry import QUERIES

spark = get_spark("remeasure-r7")


def timed(name):
    t0 = time.perf_counter()
    QUERIES[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


# warm-up: JIT + parquet footer caches
timed("top_orders")
canary = min(timed("top_orders") for _ in range(2))
out = {"canary": round(canary, 3)}
for name in NAMES:
    obs = []
    for _ in range(5):
        obs.append(round(timed(name), 3))
        spark.catalog.clearCache()
    out[name] = {"obs": obs, "min": min(obs)}
print(json.dumps(out))
spark.stop()
