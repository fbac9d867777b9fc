"""Skip-and-serve proof for the sharded dashboard panel.

The round-5 storage layer (write_sharded + zone maps) was test-proven but
unreachable from the query surface; ``panel_price_series_sharded`` closes
that.  These tests prove the serving path actually SKIPS files — not just
that results match (the oracle sweep proves that separately).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.plans import registry_ext as ext
from big_data_engineering_financial_analysis_spark.plans.registry import T_END, T_START
from big_data_engineering_financial_analysis_spark.sources.zonemap import (
    prune_files_multi,
    read_pruned_multi,
)

SF = "/root/testdata/sf0.01"
LO = dt.datetime.fromisoformat(T_START)
HI = dt.datetime.fromisoformat(T_END)


def test_sharded_panel_skips_files(spark):
    """The panel's time range must schedule strictly fewer files than the
    dataset holds (zone-map skipping), and the pruned scan's inputFiles
    must be exactly the surviving list."""
    path = ext.sharded_panel_dataset(spark, SF)
    keep, total = prune_files_multi(path, [("local_time", LO, HI)])
    assert total > len(ext.SHARD_SYMBOLS), "need >1 file per partition"
    assert 0 < len(keep) < total, f"no skipping: kept {len(keep)}/{total}"
    pruned = read_pruned_multi(spark, path, [("local_time", LO, HI)])
    assert set(pruned.inputFiles()) <= {f"file://{f}" for f in keep} | set(keep)


def test_sharded_panel_partition_pruning_composes(spark):
    """Symbol equality on top of the time range prunes to one partition
    directory: every file actually READ (input_file_name over executed
    rows — inputFiles() reports the pre-pruning relation) lives under
    stock_symbol=42, and fewer files are read than the time range alone
    keeps across all partitions."""
    path = ext.sharded_panel_dataset(spark, SF)
    keep, _total = prune_files_multi(path, [("local_time", LO, HI)])
    pruned = read_pruned_multi(spark, path, [("local_time", LO, HI)]).filter(
        F.col("stock_symbol") == "42"
    )
    read_files = {
        r[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert read_files and all("stock_symbol=42" in f for f in read_files)
    assert len(read_files) < len(keep)


def test_sharded_panel_equals_flat_twin(spark):
    """Pruning is an optimization, never a semantics change: the served
    frame equals the flat-scan enrichment filtered the same way."""
    got = (
        ext.q_panel_price_series_sharded(spark, SF)
        .orderBy("local_time")
        .collect()
    )
    flat = (
        ext._enriched(spark, SF, ["42"])
        .filter(
            (F.col("local_time") >= F.lit(LO)) & (F.col("local_time") <= F.lit(HI))
        )
        .select(
            "local_time",
            "close",
            F.round("sma_5", 6).alias("sma_5"),
            F.round("ema_10", 6).alias("ema_10"),
        )
        .orderBy("local_time")
        .collect()
    )
    assert got == flat and len(got) > 0
