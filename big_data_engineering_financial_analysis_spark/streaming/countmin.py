"""Streaming Count-Min sketch maintenance.

The CMS grid is an algebraic aggregate (cell-wise integer sums), so
Structured Streaming maintains it natively: explode each micro-batch's
rows to (depth, pos) cells and run a streaming grouped count in update
mode.  State is the grid itself — at most ``CM_DEPTH * CM_WIDTH`` rows
(3072) no matter how many distinct keys the stream carries, which is
the whole point of sketching a stream: a keyed streaming count would
hold one state row per key, unbounded.

The batch twin (:func:`operators.sketch.countmin_build`) computes the
identical grid, so stream-equals-batch parity is exact (integer
counts, deterministic md5 positions) — asserted in
``tests/test_streaming_countmin.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.operators.sketch import (
    CM_DEPTH,
    _cm_pos,
)


def countmin_stream(stream: DataFrame, key_col: str) -> DataFrame:
    """Transform a streaming DataFrame into its running CMS grid
    (d, pos, c).  Use ``outputMode("update")`` (or ``"complete"`` for a
    full-grid sink); no watermark — the sketch summarizes the whole
    stream and its state is geometry-bounded, not time-bounded."""
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    _cm_pos(F.col(key_col), d).alias("pos"),
                )
                for d in range(CM_DEPTH)
            ]
        )
    ).alias("cell")
    return (
        stream.select(cells)
        .select("cell.d", "cell.pos")
        .groupBy("d", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )
