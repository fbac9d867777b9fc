"""SCALE.md probe: distributed value_quartiles (global_index two-pass
rank + bucket arithmetic) vs the literal per-type ntile window, at 1x
(sf0.1 events) and 10x (.scratch/sf1x — tools/make_scaled_sf.py).

The claim under test: the ntile form funnels each event_type's FULL
input through one reducer chain (per-task input = the largest type),
while the distributed form bounds per-task input by the range-partition
size regardless of type skew.  Wall time is secondary at these SFs
(fixed AQE job overhead dominates the two-pass form's extra jobs);
boundedness is what must hold.

Usage: python tools/quartile_scale_probe.py [sf_dir] [runs]
Prints one JSON line; pin in PERF.md next to the other family probes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark import get_spark
from big_data_engineering_financial_analysis_spark.plans import analytics_ext

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark("quartile-probe")
events = (
    spark.read.parquet(f"{sf_dir}/events.parquet")
    .select("event_id", "event_type", "value")
    .localCheckpoint()  # pin the scan out of every measurement
)
n = events.count()
out = {"sf_dir": sf_dir, "rows": n}


def best(fn):
    obs = []
    for _ in range(runs):
        spark.catalog.clearCache()  # sibling-probe hygiene (export_scale_probe)
        t0 = time.perf_counter()
        fn()
        obs.append(time.perf_counter() - t0)
    return round(min(obs), 3)


def ntile_form():
    w = Window.partitionBy("event_type").orderBy(
        F.asc_nulls_last("value"), F.asc_nulls_last("event_id")
    )
    return (
        events.withColumn("quartile", F.ntile(4).over(w).cast("long"))
        .groupBy("event_type", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


out["ntile_window_sec"] = best(lambda: ntile_form().collect())
out["distributed_sec"] = best(
    lambda: analytics_ext.value_quartiles(events).collect()
)

# Boundedness: the largest single-task sort input on each path.
# ntile form: one task per event_type -> max task = largest type.
# distributed form: max task = largest range partition of the
# global_index exchange (n / num_partitions up to sampling wobble).
by_type = events.groupBy("event_type").count().collect()
out["largest_type_rows"] = max(r["count"] for r in by_type)
n_parts = max(2, spark.sparkContext.defaultParallelism)
ranged = events.repartitionByRange(
    n_parts,
    F.asc_nulls_last("event_type"),
    F.asc_nulls_last("value"),
    F.asc_nulls_last("event_id"),
)
pid_counts = (
    ranged.groupBy(F.spark_partition_id().alias("pid")).count().collect()
)
out["max_range_partition_rows"] = max(r["count"] for r in pid_counts)
out["parity"] = sorted(map(tuple, ntile_form().collect())) == sorted(
    map(tuple, analytics_ext.value_quartiles(events).collect())
)
print(json.dumps(out))
