"""10x scale probe for the partition-sharded zone map (sources/zonemap.py).

Builds a Hive-partitioned, time-clustered dataset at two sizes (10x
rows, 10x files), then measures: zone-map build time, manifest layout
(root vs shard bytes), and prune-decision latency for a range predicate
with and without a partition predicate — the claim under test is that
the lazy shard loader bounds prune latency by the partitions a query
touches, not the dataset.  Run on an idle machine:

    PYTHONPATH=/root/repo python tools/zonemap_scale_probe.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

from big_data_engineering_financial_analysis_spark.sources import zonemap as zm  # noqa: E402
from big_data_engineering_financial_analysis_spark.sources.dataset import write_sharded  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .appName("zonemap-probe")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

N_LANGS = 8
results = {}
for label, n_rows, per_file in [("1x", 50_000, 2_000), ("10x", 500_000, 2_000)]:
    root = tempfile.mkdtemp(prefix=f"zoneprobe_{label}_")
    path = os.path.join(root, "ds")
    # score ascends with id -> files are score-clustered within each
    # partition: the zone map has real ranges to cut
    df = spark.range(n_rows).selectExpr(
        "id AS doc_id",
        f"CAST(id % {N_LANGS} AS STRING) AS lang",
        "CAST(id AS DOUBLE) AS score",
    )
    write_sharded(
        df, path, partition_cols=["lang"], sort_cols=["score"],
        max_records_per_file=per_file,
    )

    t0 = time.monotonic()
    zm.build_zonemap(path, ["score"])
    build_s = time.monotonic() - t0

    root_bytes = os.path.getsize(os.path.join(path, zm.MANIFEST_NAME))
    shard_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
        if f == zm.MANIFEST_NAME and r != path
    )
    n_files = len(zm._data_files(path))

    # range predicate alone (all shards open) vs range + partition
    # predicate (one shard opens); 20 reps, report the minimum
    lo, hi = float(n_rows) * 0.4, float(n_rows) * 0.401

    def best(predicates, reps=20):
        t_best = float("inf")
        kept = total = None
        for _ in range(reps):
            t0 = time.monotonic()
            kept_files, total = zm.prune_files_multi(path, predicates)
            t_best = min(t_best, time.monotonic() - t0)
            kept = len(kept_files)
        return t_best, kept, total

    t_all, kept_all, total = best([("score", lo, hi)])
    t_part, kept_part, _ = best([("score", lo, hi), ("lang", "3", "3")])

    results[label] = {
        "files": n_files,
        "build_s": round(build_s, 3),
        "root_manifest_bytes": root_bytes,
        "shard_manifest_bytes": shard_bytes,
        "prune_range_only_ms": round(t_all * 1000, 2),
        "kept_range_only": kept_all,
        "prune_range_plus_partition_ms": round(t_part * 1000, 2),
        "kept_range_plus_partition": kept_part,
        "total_files": total,
    }
    shutil.rmtree(root)

print(json.dumps(results, indent=2))
spark.stop()
