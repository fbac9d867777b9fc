"""SCALE.md probe: schema-evolution sidecar backfill cost at 1x/10x.

The claim under test: after an evolution, the incremental update's
one-time backfill of pre-evolution files (recording all-NULL zones /
empty Bloom markers) is FOOTER-ONLY — linear in pre-evolution file
count with a per-file cost of one metadata read, never a data read —
and a second update is a no-op.  For contrast the probe also times the
full Bloom rebuild (which DOES read data columns): backfill must sit
well under it.

Usage: python tools/evolution_scale_probe.py [n_files_1x]
Prints one JSON line; pin in PERF.md next to the other family probes.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark import get_spark
from big_data_engineering_financial_analysis_spark.sources import bloomskip as bs
from big_data_engineering_financial_analysis_spark.sources import zonemap as zm
from big_data_engineering_financial_analysis_spark.sources.dataset import write_sharded
from big_data_engineering_financial_analysis_spark.sources.evolution import append_evolved

n_files_1x = int(sys.argv[1]) if len(sys.argv) > 1 else 64
spark = get_spark("evolution-probe")
scratch = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "evolution_probe",
)
out = {}

for tag, n_files in (("1x", n_files_1x), ("10x", n_files_1x * 10)):
    path = os.path.join(scratch, tag)
    shutil.rmtree(path, ignore_errors=True)
    rows_per_file = 500
    base = (
        spark.range(n_files * rows_per_file)
        .select(
            F.col("id"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
    )
    write_sharded(
        base, path, partition_cols=[], sort_cols=["id"],
        max_records_per_file=rows_per_file,
    )
    zm.build_zonemap(path, ["id"])
    bs.build_bloom_index(path, ["id"], spark=spark)
    pre_files = zm.count_data_files(path)
    evolved = spark.range(1_000_000, 1_000_000 + rows_per_file).select(
        F.col("id"), F.col("id").cast("double").alias("score")
    )
    append_evolved(evolved, path, partition_cols=[], sort_cols=["id"])

    t0 = time.perf_counter()
    zm.update_zonemap(path, ["score"])
    zm_backfill = time.perf_counter() - t0
    t0 = time.perf_counter()
    bs.update_bloom_index(path, ["score"], spark=spark)
    bloom_backfill = time.perf_counter() - t0
    t0 = time.perf_counter()
    zm.update_zonemap(path, ["score"])
    bs.update_bloom_index(path, ["score"], spark=spark)
    second_update = time.perf_counter() - t0
    t0 = time.perf_counter()
    bs.build_bloom_index(path, ["id", "score"], spark=spark)
    full_rebuild = time.perf_counter() - t0

    keep, _ = zm.prune_files(path, "score", lo=0.0, hi=2e6)
    keep_b, _ = bs.prune_files_eq(path, "score", [1_000_001.0])
    total = zm.count_data_files(path)
    out[tag] = {
        "pre_evolution_files": pre_files,
        "zonemap_backfill_sec": round(zm_backfill, 3),
        "bloom_backfill_sec": round(bloom_backfill, 3),
        "second_update_noop_sec": round(second_update, 3),
        "full_bloom_rebuild_sec": round(full_rebuild, 3),
        "zone_kept_of_total": f"{len(keep)}/{total}",
        "bloom_kept_of_total": f"{len(keep_b)}/{total}",
    }
    assert len(keep) < total and len(keep_b) < total

print(json.dumps(out))
