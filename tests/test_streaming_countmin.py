"""Streaming CMS grid == batch CMS grid (exact integer parity), and the
state stays geometry-bounded regardless of key cardinality."""

from __future__ import annotations

from big_data_engineering_financial_analysis_spark.operators.sketch import (
    CM_DEPTH,
    CM_WIDTH,
    countmin_build,
    countmin_estimate,
)
from big_data_engineering_financial_analysis_spark.streaming.countmin import (
    countmin_stream,
)


def _feed(spark, src_dir, batches):
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "k long").coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)


def test_stream_grid_equals_batch_grid(spark, tmp_path):
    src = str(tmp_path / "src")
    batches = [
        [(i % 37,) for i in range(300)],
        [(i % 53,) for i in range(200)],
        [(i,) for i in range(900, 1100)],  # long-tail keys
    ]
    _feed(spark, src, batches)

    stream = (
        spark.readStream.schema("k long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        countmin_stream(stream, "k")
        .writeStream.format("memory")
        .queryName("cms_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    streamed = {
        (r["d"], r["pos"]): r["c"]
        for r in spark.sql("SELECT * FROM cms_out").collect()
    }
    all_rows = [r for b in batches for r in b]
    batch_df = spark.createDataFrame(all_rows, "k long")
    batch = {
        (r["d"], r["pos"]): r["c"] for r in countmin_build(batch_df, "k").collect()
    }
    assert streamed == batch
    # state bound: the grid never exceeds its geometry
    assert len(streamed) <= CM_DEPTH * CM_WIDTH

    # the streamed grid answers point queries exactly like the batch one
    grid_df = spark.createDataFrame(
        [(d, p, c) for (d, p), c in streamed.items()], "d int, pos long, c long"
    )
    cands = batch_df.distinct()
    got = {
        r["k"]: r["est_count"]
        for r in countmin_estimate(grid_df, cands, "k").collect()
    }
    want = {
        r["k"]: r["est_count"]
        for r in countmin_estimate(
            countmin_build(batch_df, "k"), cands, "k"
        ).collect()
    }
    assert got == want
