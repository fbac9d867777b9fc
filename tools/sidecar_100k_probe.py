"""100k-file probe for the streaming sidecar builds (verdict r10 ask #4).

The r10 fix proved the shard-streaming Bloom build at 33k files; the
1M-file claim was an extrapolation.  This probe builds a ~100k-file
partitioned dataset (1,024 leaf partitions x ~100 tiny files) and
measures, with driver max-RSS tracked across phases:

* ``build_bloom_index(spark=)`` — est. filter volume ~830 MB >>
  BUILD_STREAM_BYTES, so the STREAMING path runs for real (no
  monkeypatched threshold): wall, driver RSS growth, shard count.
* ``build_zonemap(spark=)`` — the r10 distributed footer scan with its
  single collect (zones are ~100 B/col/file, so ~10 MB here and
  ~100 MB/col at 1M files — the documented driver-safe bound): wall,
  RSS growth.
* a point-probe prune over the result, proving the sidecars the
  streaming build wrote actually serve.

Run on an idle machine:

    PYTHONPATH=/root/repo python tools/sidecar_100k_probe.py [n_parts files_per_part]
"""

import json
import os
import resource
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

from big_data_engineering_financial_analysis_spark.sources import bloomskip as bs  # noqa: E402
from big_data_engineering_financial_analysis_spark.sources import zonemap as zm  # noqa: E402
from big_data_engineering_financial_analysis_spark.sources.dataset import write_sharded  # noqa: E402

N_PARTS = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
FILES_PER_PART = int(sys.argv[2]) if len(sys.argv) > 2 else 100
ROWS_PER_FILE = 4

spark = (
    SparkSession.builder.master("local[8]")
    .appName("sidecar-100k-probe")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


out: dict = {"n_parts": N_PARTS, "files_per_part": FILES_PER_PART}
root = tempfile.mkdtemp(prefix="sidecar100k_")
path = os.path.join(root, "ds")
try:
    n_rows = N_PARTS * FILES_PER_PART * ROWS_PER_FILE
    df = spark.range(n_rows).selectExpr(
        "id AS doc_id",
        f"CONCAT('p', CAST(id % {N_PARTS} AS STRING)) AS part",
        "CAST(id % 100 AS DOUBLE) AS score",
    )
    t0 = time.monotonic()
    write_sharded(
        df, path, partition_cols=["part"], sort_cols=["score"],
        max_records_per_file=ROWS_PER_FILE,
    )
    out["write_s"] = round(time.monotonic() - t0, 1)
    out["n_files"] = len(bs._data_files(path))
    out["rss_after_write_mb"] = round(rss_mb(), 1)

    # ---- streaming Bloom build (real threshold, no monkeypatch) ----
    per_file = bs.DEFAULT_N_BITS // 8 + 96
    out["est_filter_mb"] = round(out["n_files"] * per_file / 2**20, 1)
    if not os.environ.get("PROBE_SMOKE"):
        assert out["est_filter_mb"] * 2**20 > bs.BUILD_STREAM_BYTES, (
            "probe must exercise the STREAMING path at the real threshold"
        )
    t0 = time.monotonic()
    res = bs.build_bloom_index(path, ["doc_id"], spark=spark)
    out["bloom_build_s"] = round(time.monotonic() - t0, 1)
    out["bloom_streamed"] = res.get("streamed") is True
    out["bloom_leaves"] = res.get("leaves")
    out["rss_after_bloom_mb"] = round(rss_mb(), 1)
    out["sidecar_mb"] = round(
        sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(path)
            for f in fs
            if f == bs.MANIFEST_NAME
        )
        / 2**20,
        1,
    )
    out["root_manifest_bytes"] = os.path.getsize(
        os.path.join(path, bs.MANIFEST_NAME)
    )

    # ---- distributed zonemap footer scan (single tiny collect) ----
    t0 = time.monotonic()
    manifest = zm.build_zonemap(path, ["score"], spark=spark)
    out["zonemap_build_s"] = round(time.monotonic() - t0, 1)
    out["zonemap_files"] = len(manifest)
    out["rss_after_zonemap_mb"] = round(rss_mb(), 1)

    # ---- the sidecars serve: point probe prunes to ~the probed files ----
    # with the leaf summary (r11): whole leaves drop before any shard
    # manifest is opened — the root-wide probe's cost scales with
    # MATCHING leaves, not all leaves.  Each variant is measured twice
    # and reports the WARM run so the comparison is not biased by which
    # variant paid the first-touch page-cache misses (r11 review).
    def timed_prune():
        t0 = time.monotonic()
        kept, tot = bs.prune_files_eq(path, "doc_id", [31337])
        return time.monotonic() - t0, kept, tot

    # THREE runs (r12): run 1 walks (dfp seals drifted by the zonemap
    # build writing into every leaf dir) and SELF-HEALS them; run 2
    # takes the walk-free fast path but re-parses the healed summary
    # (its write invalidated the stat-sealed parse cache); run 3 is the
    # steady serving state — fast path + warm parse cache.
    cold_s, keep, total = timed_prune()
    warm_s, keep, total = timed_prune()
    warm2_s, keep, total = timed_prune()
    out["prune_heal_s"] = round(cold_s, 2)
    out["prune_summary_s"] = round(warm_s, 2)
    out["prune_summary_warm_s"] = round(warm2_s, 2)
    out["prune_keep"] = len(keep)
    out["prune_total"] = total
    out["summary_mb"] = round(
        os.path.getsize(os.path.join(path, bs.SUMMARY_NAME)) / 2**20, 1
    )
    # without it (pre-r11 shape): every leaf's shard manifest is opened
    os.remove(os.path.join(path, bs.SUMMARY_NAME))
    _cold2, keep2, _t = timed_prune()
    warm2_s, keep2, _t = timed_prune()
    out["prune_s"] = round(warm2_s, 2)
    assert sorted(keep2) == sorted(keep)
finally:
    shutil.rmtree(root, ignore_errors=True)

print(json.dumps(out))
spark.stop()
