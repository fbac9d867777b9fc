"""10x scale probe for the Bloom sidecar (sources/bloomskip.py).

Builds an unclustered-key dataset at two sizes (10x rows, 10x files),
then measures: sidecar build time, manifest size, file-skip selectivity
for point probes, and pruned-read vs full-scan latency.  Run on an idle
machine:

    PYTHONPATH=/root/repo python tools/bloomskip_scale_probe.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

from big_data_engineering_financial_analysis_spark.sources import bloomskip as bs  # noqa: E402
from big_data_engineering_financial_analysis_spark.sources.dataset import write_sharded  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .appName("bloomskip-probe")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

results = {}
for label, n_rows, per_file in [("1x", 50_000, 2_000), ("10x", 500_000, 2_000)]:
    root = tempfile.mkdtemp(prefix=f"bloomprobe_{label}_")
    path = os.path.join(root, "ds")
    # doc_id round-robin across the sort axis -> unclustered: zones useless
    df = spark.range(n_rows).selectExpr(
        f"(id * 37) % {n_rows} AS doc_id",
        "CASE WHEN id % 4 = 0 THEN 'de' ELSE 'en' END AS lang",
        "CAST(id % 100 AS DOUBLE) AS score",
    )
    write_sharded(df, path, partition_cols=["lang"], sort_cols=["score"], max_records_per_file=per_file)

    # distributed FIRST (cold page cache), sequential second (warm): the
    # cache bias runs AGAINST the distributed claim, so a reported
    # speedup is a conservative lower bound
    t0 = time.monotonic()
    bs.build_bloom_index(path, ["doc_id"], spark=spark)
    build_dist_s = time.monotonic() - t0

    t0 = time.monotonic()
    bs.build_bloom_index(path, ["doc_id"])
    build_s = time.monotonic() - t0

    root_manifest_bytes = os.path.getsize(os.path.join(path, bs.MANIFEST_NAME))
    sidecar_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(path)
        for f in fs
        if f == bs.MANIFEST_NAME
    )
    n_files = len(bs._data_files(path))

    probes = [3, 7_777, 31_337 % n_rows]
    t0 = time.monotonic()
    keep, total = bs.prune_files_eq(path, "doc_id", probes)
    prune_s = time.monotonic() - t0

    # partition-constrained prune: the lake-scale shape — only the
    # surviving partition's shard manifest is opened, so this latency is
    # bounded by the partitions a query touches, not the dataset
    t0 = time.monotonic()
    keep_part, _ = bs.prune_files_combined(
        path, eq=[("lang", ["de"]), ("doc_id", probes)]
    )
    prune_part_s = time.monotonic() - t0

    t0 = time.monotonic()
    got = bs.read_point(spark, path, "doc_id", probes).collect()
    point_s = time.monotonic() - t0

    t0 = time.monotonic()
    full = (
        spark.read.parquet(path)
        .filter(f"doc_id IN ({', '.join(map(str, probes))})")
        .collect()
    )
    full_s = time.monotonic() - t0
    assert sorted(r.doc_id for r in got) == sorted(r.doc_id for r in full)

    results[label] = {
        "rows": n_rows,
        "files": n_files,
        "build_s": round(build_s, 2),
        "build_distributed_s": round(build_dist_s, 2),
        "root_manifest_bytes": root_manifest_bytes,
        "sidecar_total_kb": round(sidecar_bytes / 1024, 1),
        "kept_files": len(keep),
        "kept_files_partition_constrained": len(keep_part),
        "total_files": total,
        "prune_ms": round(prune_s * 1000, 1),
        "prune_partition_constrained_ms": round(prune_part_s * 1000, 1),
        "point_read_s": round(point_s, 2),
        "full_scan_s": round(full_s, 2),
    }
    shutil.rmtree(root, ignore_errors=True)

print(json.dumps(results, indent=2))
