"""SCALE.md probe: Z-order clustered write (operators/layout.write_zordered)
vs a linear single-key sort, measured as FILE-SKIP ratios on both layout
dimensions plus the write cost, at 1x (sf0.01) and 10x (sf0.1) events.

The claim under test: the Morton layout bounds BOTH dimensions per
file, so zone-map pruning skips on either predicate; the linear layout
serves only its leading column (trailing-column zones span the whole
range — zero skipping).  At 100 TB the skip ratio IS the scan bill:
a layout that turns a 5%-selective predicate on a second dimension
into a ~90% file skip removes ~90% of that query's IO.

Usage: python tools/zorder_write_probe.py [sf_dir] [n_files]
Prints one JSON line; pin in PERF.md next to the other family probes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_engineering_financial_analysis_spark import get_spark
from big_data_engineering_financial_analysis_spark.operators.layout import write_zordered
from big_data_engineering_financial_analysis_spark.sources import zonemap as zm

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32

spark = get_spark("zorder-probe")
events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
    "event_id", "ts", "user_id", "value"
)
n = events.count()
out = {"sf_dir": sf_dir, "rows": n, "n_files": n_files}

scratch = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "zorder_probe",
)
zpath = os.path.join(scratch, "z")
lpath = os.path.join(scratch, "linear")

# both probed dimensions ~5%-selective bands around the middle of the
# value space (computed once from data so 1x and 10x stay comparable)
u_row = events.selectExpr(
    "percentile_approx(user_id, 0.475)", "percentile_approx(user_id, 0.525)"
).first()
u_lo, u_hi = u_row[0], u_row[1]
v_row = events.selectExpr(
    "percentile_approx(value, 0.475)", "percentile_approx(value, 0.525)"
).first()
v_lo, v_hi = v_row[0], v_row[1]

mpath = os.path.join(scratch, "minmax")
t0 = time.perf_counter()
write_zordered(events, zpath, ["user_id", "value"], n_files=n_files)
out["zorder_write_sec"] = round(time.perf_counter() - t0, 3)

t0 = time.perf_counter()
write_zordered(
    events, mpath, ["user_id", "value"], n_files=n_files, code_mode="minmax"
)
out["zorder_minmax_write_sec"] = round(time.perf_counter() - t0, 3)

t0 = time.perf_counter()
(
    events.repartitionByRange(n_files, "user_id")
    .sortWithinPartitions("user_id")
    .write.mode("overwrite")
    .parquet(lpath)
)
zm.build_zonemap(lpath, ["user_id", "value"])
out["linear_write_sec"] = round(time.perf_counter() - t0, 3)

for tag, path in (("zorder", zpath), ("zorder_minmax", mpath), ("linear", lpath)):
    total = zm.count_data_files(path)
    keep_u, _ = zm.prune_files(path, "user_id", lo=u_lo, hi=u_hi)
    keep_v, _ = zm.prune_files(path, "value", lo=v_lo, hi=v_hi)
    out[f"{tag}_files"] = total
    out[f"{tag}_lead_dim_skip"] = round(1 - len(keep_u) / total, 3)
    out[f"{tag}_second_dim_skip"] = round(1 - len(keep_v) / total, 3)
    # correctness spot-check: pruned read == full scan + filter
    got = zm.read_pruned(spark, path, "value", lo=v_lo, hi=v_hi).count()
    expect = events.filter(
        (events.value >= v_lo) & (events.value <= v_hi)
    ).count()
    assert got == expect, (tag, got, expect)

print(json.dumps(out))
