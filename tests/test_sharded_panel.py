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


def test_ensure_dataset_is_idempotent_and_write_once(spark, tmp_path, monkeypatch):
    """ensure_sharded_panel_dataset writes on first call, then serves the
    existing store untouched (the serve-only twins' bench contract); a
    config change invalidates the marker and rewrites."""
    import os

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    monkeypatch.setattr(tempfile, "tempdir", None)  # re-read TMPDIR
    path = ext.ensure_sharded_panel_dataset(spark, SF)
    assert os.path.exists(os.path.join(path, "_ready.json"))
    mtimes = {
        f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)
    }
    assert ext.ensure_sharded_panel_dataset(spark, SF) == path
    assert {
        f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)
    } == mtimes, "second call must not rewrite anything"
    # config change -> rewrite
    monkeypatch.setattr(ext, "SHARD_MAX_RECORDS", ext.SHARD_MAX_RECORDS + 1)
    assert ext.ensure_sharded_panel_dataset(spark, SF) == path
    assert os.path.exists(os.path.join(path, "_ready.json"))


def test_ensure_dataset_rewrites_stale_layout_version(spark, tmp_path, monkeypatch):
    """A store left behind by an OLDER engine version — its marker has no
    (or an older) layout_version token — must be rewritten, not served:
    the serve-only rows would otherwise bench/verify against data whose
    enrichment logic or layout predates the current engine (ADVICE r7)."""
    import json
    import os
    import tempfile

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    monkeypatch.setattr(tempfile, "tempdir", None)
    path = ext.ensure_sharded_panel_dataset(spark, SF)
    marker = os.path.join(path, "_ready.json")
    # simulate a pre-version-token store: old marker shape, same config
    with open(marker, "w") as fh:
        json.dump({"symbols": ext.SHARD_SYMBOLS, "max_records": ext.SHARD_MAX_RECORDS}, fh)
    before = os.path.getmtime(marker)
    assert ext.ensure_sharded_panel_dataset(spark, SF) == path
    with open(marker) as fh:
        assert json.load(fh)["layout_version"] == ext.SHARD_LAYOUT_VERSION
    assert os.path.getmtime(marker) >= before
    # and a FUTURE version token (newer engine wrote it) also rewrites —
    # the guard is equality on the full config dict, never >= comparisons
    with open(marker, "w") as fh:
        json.dump(
            {
                "layout_version": ext.SHARD_LAYOUT_VERSION + 1,
                "symbols": ext.SHARD_SYMBOLS,
                "max_records": ext.SHARD_MAX_RECORDS,
            },
            fh,
        )
    assert ext.ensure_sharded_panel_dataset(spark, SF) == path
    with open(marker) as fh:
        assert json.load(fh)["layout_version"] == ext.SHARD_LAYOUT_VERSION


def test_time_bounded_panel_twins_skip_files_and_match_flat(spark):
    """Each registered *_sharded panel twin must (a) skip files on its
    time bounds and (b) reproduce the flat panel's rows exactly."""
    path = ext.ensure_sharded_panel_dataset(spark, SF)
    for panel, (lo_s, hi_s) in ext.PANEL_TIME_BOUNDS.items():
        lo, hi = dt.datetime.fromisoformat(lo_s), dt.datetime.fromisoformat(hi_s)
        keep, total = prune_files_multi(path, [("local_time", lo, hi)])
        assert 0 < len(keep) < total, f"{panel}: kept {len(keep)}/{total}"
        got = ext.run_panel_sharded(spark, SF, panel).toPandas()
        want = ext.QUERIES[panel](spark, SF).toPandas()
        cols = sorted(want.columns)
        assert sorted(got.columns) == cols
        a = got[cols].astype(str).sort_values(cols).values.tolist()
        b = want[cols].astype(str).sort_values(cols).values.tolist()
        assert a == b and len(a) > 0, panel


def test_symbol_only_panels_serve_through_store(spark):
    """The non-time-bounded panels run through the same store (Hive
    pruning only — the zone map has no range to cut, the documented
    reason they keep the flat registry rows): results equal the flat
    panels cell-for-cell."""
    for panel in ext.dashboard.PANEL_SQL:
        if panel in ext.PANEL_TIME_BOUNDS:
            continue
        got = ext.run_panel_sharded(spark, SF, panel).toPandas()
        want = ext.QUERIES[panel](spark, SF).toPandas()
        cols = sorted(want.columns)
        assert sorted(got.columns) == cols, panel
        a = got[cols].astype(str).sort_values(cols).values.tolist()
        b = want[cols].astype(str).sort_values(cols).values.tolist()
        assert a == b, panel


def test_serve_only_twin_matches_write_and_serve(spark):
    """panel_price_series_serve (staged write) == panel_price_series_sharded
    (write + serve) row-for-row."""
    a = sorted(map(tuple, ext.q_panel_price_series_serve(spark, SF).collect()))
    b = sorted(map(tuple, ext.q_panel_price_series_sharded(spark, SF).collect()))
    assert a == b and len(a) > 0
