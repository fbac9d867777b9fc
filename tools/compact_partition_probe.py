"""Scale probe for partition-scoped compaction (sources/dataset.py,
``compact_partition`` — K14).

The operational claim to verify: cost is O(touched partition) — wall
time tracks the ONE partition's file count and is flat in both the
NUMBER of untouched sibling partitions and their file counts, and the
dirs-bounded sidecar refresh rewrites only the touched partition's
shard manifests.  Grid:

* files-per-partition sweep on a fixed dataset: compact one partition
  holding 256 / 1k / 4k / 10k files — wall should scale with that
  count (the rewrite is the payload);
* sibling sweep at a fixed touched-partition size: 8 / 64 / 512
  sibling partitions (up to ~131k total files standing in for the
  1M-file regime's metadata pressure) — wall should be FLAT, and
  untouched shard manifests' mtimes unchanged.

Run on an idle machine:

    PYTHONPATH=/root/repo python tools/compact_partition_probe.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Row, SparkSession  # noqa: E402

from big_data_engineering_financial_analysis_spark.sources import bloomskip as bs  # noqa: E402
from big_data_engineering_financial_analysis_spark.sources import zonemap as zm  # noqa: E402
from big_data_engineering_financial_analysis_spark.sources.dataset import (  # noqa: E402
    compact_partition,
)

spark = (
    SparkSession.builder.master("local[8]")
    .appName("compact-partition-probe")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

ROWS_PER_FILE = 4  # tiny files: the regime compaction exists to fix


def build(path: str, n_parts: int, files_hot: int, files_cold: int) -> None:
    """lang=p0 holds ``files_hot`` files; every other partition
    ``files_cold``.  One row group per file via per-partition writes of
    pre-split frames (fast: one job per generation, not per file)."""
    hot = spark.createDataFrame(
        [
            Row(doc_id=i, v=float(i))
            for i in range(files_hot * ROWS_PER_FILE)
        ]
    ).repartition(files_hot)
    hot.write.mode("overwrite").parquet(os.path.join(path, "lang=p0"))
    if n_parts > 1:
        # ONE job for all cold partitions: range-partition on (part, id)
        # gives each task a contiguous slice of one partition directory,
        # so every partition lands ~files_cold files
        cold = spark.createDataFrame(
            [
                Row(
                    doc_id=j * 1_000_000 + i,
                    lang=f"p{j}",
                    v=float(i),
                )
                for j in range(1, n_parts)
                for i in range(files_cold * ROWS_PER_FILE)
            ]
        )
        (
            cold.repartitionByRange(
                (n_parts - 1) * files_cold, "lang", "doc_id"
            )
            .write.mode("append")
            .partitionBy("lang")
            .parquet(path)
        )
    # sharded sidecars over the whole dataset (root marker + per-leaf
    # shards: _write_manifest shard="auto" shards partitioned layouts)
    zm.build_zonemap(path, ["doc_id"])
    bs.build_bloom_index(path, ["doc_id"], spark=spark)


def shard_mtimes(path: str) -> dict[str, float]:
    out = {}
    for d in os.listdir(path):
        full = os.path.join(path, d, zm.MANIFEST_NAME)
        if os.path.isfile(full):
            out[d] = os.path.getmtime(full)
    return out


def n_files(path: str) -> int:
    return sum(
        1
        for root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def probe(n_parts: int, files_hot: int, files_cold: int) -> dict:
    base = tempfile.mkdtemp(prefix="cpp_")
    path = os.path.join(base, "ds")
    try:
        build(path, n_parts, files_hot, files_cold)
        total = n_files(path)
        before = shard_mtimes(path)
        t0 = time.perf_counter()
        compact_partition(spark, path, "lang=p0", sort_cols=["doc_id"])
        wall = time.perf_counter() - t0
        after = shard_mtimes(path)
        untouched_dirty = [
            d for d in before if d != "lang=p0" and after.get(d) != before[d]
        ]
        return {
            "partitions": n_parts,
            "files_hot": files_hot,
            "files_cold": files_cold,
            "total_files_before": total,
            "wall_sec": round(wall, 3),
            "untouched_shards_rewritten": untouched_dirty,
            "hot_files_after": n_files(os.path.join(path, "lang=p0")),
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    results = []
    # sweep 1: touched-partition size (few siblings, cost = the rewrite)
    for files_hot in (256, 1024, 4096, 10240):
        results.append(probe(n_parts=8, files_hot=files_hot, files_cold=64))
        print(json.dumps(results[-1]), flush=True)
    # sweep 2: sibling pressure at fixed touched size (metadata regime)
    for n_parts in (8, 64, 512):
        results.append(probe(n_parts=n_parts, files_hot=256, files_cold=256))
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
    spark.stop()
