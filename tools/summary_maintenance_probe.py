"""Per-batch cost of the dirs-bounded sidecar maintenance against the
leaf-summary index — the advisor-r11 'shard or compress the summary
past ~10k leaves' question, measured.

The streaming sink's per-batch `update_bloom_index(dirs=[touched])`
refreshes only the touched leaves' SHARD manifests (O(touched)), but
the leaf summary is ONE root file: every refresh rewrites the whole
O(leaves × cols) JSON.  This probe builds an N-leaf dataset, then
times a one-leaf dirs-bounded update (append one file + refresh) —
the summary rewrite is the dominant term and scales with TOTAL leaf
count, not touched count.

    PYTHONPATH=/root/repo python tools/summary_maintenance_probe.py [n_leaves]
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

N_LEAVES = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

spark = (
    SparkSession.builder.master("local[8]")
    .appName("summary-maintenance-probe")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

root = tempfile.mkdtemp(prefix="summaint_")
path = os.path.join(root, "ds")
out = {"n_leaves": N_LEAVES}
try:
    df = spark.range(N_LEAVES * 40).selectExpr(
        "id AS doc_id",
        f"CONCAT('p', CAST(id % {N_LEAVES} AS STRING)) AS part",
    )
    write_sharded(df, path, partition_cols=["part"], sort_cols=["doc_id"])
    bs.build_bloom_index(path, ["doc_id"], spark=spark)
    out["summary_mb"] = round(
        os.path.getsize(os.path.join(path, bs.SUMMARY_NAME)) / 2**20, 2
    )
    obs = []
    for i in range(4):
        extra = spark.createDataFrame(
            [{"doc_id": 10_000_000 + i, "part": "p0"}]
        )
        extra.coalesce(1).write.mode("append").parquet(f"{path}/part=p0")
        t0 = time.monotonic()
        bs.update_bloom_index(path, ["doc_id"], dirs=["part=p0"])
        obs.append(round(time.monotonic() - t0, 3))
    out["one_leaf_update_obs"] = obs
    out["one_leaf_update_min"] = min(obs[1:])
    # a fresh point probe still serves after the appends
    keep, total = bs.prune_files_eq(path, "doc_id", [10_000_000])
    out["post_update_prune_keep"] = len(keep)
finally:
    shutil.rmtree(root, ignore_errors=True)
print(json.dumps(out))
spark.stop()
