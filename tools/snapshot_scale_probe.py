"""10x scale probe for snapshot isolation (sources/snapshots.py).

Writes a dataset at two file counts (10x files), then measures: snapshot
commit latency (should be linear in files, zero data bytes), on-disk
overhead of a version (hardlinks: only directory entries + sidecar
copies), pinned-read latency vs live read, and expiry latency.  Run on an
idle machine:

    PYTHONPATH=/root/repo python tools/snapshot_scale_probe.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

from big_data_engineering_financial_analysis_spark.sources import snapshots as sn  # noqa: E402
from big_data_engineering_financial_analysis_spark.sources import zonemap as zm  # noqa: E402
from big_data_engineering_financial_analysis_spark.sources.dataset import write_sharded  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .appName("snapshot-probe")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def du(path: str) -> int:
    """Apparent NEW bytes under path, counting each inode's size only when
    st_nlink == 1 would undercount hardlinks shared with live — instead
    count directory-entry overhead as size of files whose inode is shared
    (0 new data bytes) plus unique files fully."""
    seen_live = set()
    live_root = path.rstrip("/").rsplit("._snapshots", 1)[0]
    for root, _d, files in os.walk(live_root):
        if "._snapshots" in root:
            continue
        for f in files:
            try:
                seen_live.add(os.stat(os.path.join(root, f)).st_ino)
            except OSError:
                pass
    new = 0
    for root, _d, files in os.walk(path):
        for f in files:
            st = os.stat(os.path.join(root, f))
            if st.st_ino not in seen_live:
                new += st.st_size
    return new


results = {}
for label, n_rows, per_file in [("1x", 60_000, 1_000), ("10x", 600_000, 1_000)]:
    root = tempfile.mkdtemp(prefix=f"snapprobe_{label}_")
    path = os.path.join(root, "ds")
    df = spark.range(n_rows).selectExpr(
        "id as doc_id",
        "cast(id % 4 as string) as lang",
        "cast(id * 1.5 as double) as score",
    )
    write_sharded(df, path, ["lang"], ["score"], max_records_per_file=per_file)
    zm.build_zonemap(path, ["score"])
    n_files = len(zm._data_files(path))

    t0 = time.time()
    v = sn.commit_snapshot(path, note="probe")
    commit_s = time.time() - t0

    snap_dir = os.path.join(sn._snap_root(path), f"v{v:08d}")
    new_bytes = du(snap_dir)

    t0 = time.time()
    live_rows = spark.read.parquet(path).count()
    live_read_s = time.time() - t0
    t0 = time.time()
    snap_rows = sn.read_snapshot(spark, path, v).count()
    snap_read_s = time.time() - t0
    assert snap_rows == live_rows == n_rows

    # manifest mode: the object-store-capable pin — commit should be
    # ~constant-small (one JSON write), pinned read resolves against the
    # live tree
    t0 = time.time()
    vm = sn.commit_snapshot(path, note="probe-manifest", mode="manifest")
    commit_manifest_s = time.time() - t0
    vm_dir = os.path.join(sn._snap_root(path), f"v{vm:08d}")
    manifest_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(vm_dir)
        for f in fs
    )
    t0 = time.time()
    assert sn.read_snapshot(spark, path, vm).count() == n_rows
    manifest_read_s = time.time() - t0

    t0 = time.time()
    sn.expire_snapshots(path, keep_last=0)
    expire_s = time.time() - t0

    results[label] = {
        "files": n_files,
        "commit_s": round(commit_s, 3),
        "commit_manifest_s": round(commit_manifest_s, 3),
        "manifest_version_bytes": manifest_bytes,
        "new_bytes_in_snapshot": new_bytes,
        "live_read_s": round(live_read_s, 3),
        "snap_read_s": round(snap_read_s, 3),
        "manifest_read_s": round(manifest_read_s, 3),
        "expire_s": round(expire_s, 3),
    }
    shutil.rmtree(root, ignore_errors=True)

print(json.dumps(results, indent=2))
r1, r10 = results["1x"], results["10x"]
print(
    f"commit scaling: {r10['commit_s'] / max(r1['commit_s'], 1e-9):.2f}x "
    f"for {r10['files'] / r1['files']:.1f}x files; "
    f"new data bytes per snapshot: {r1['new_bytes_in_snapshot']} / "
    f"{r10['new_bytes_in_snapshot']} (sidecar copies only)"
)
