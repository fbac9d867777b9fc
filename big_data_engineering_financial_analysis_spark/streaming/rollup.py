"""Streaming maintenance of an incrementally-merged rollup table.

Ties the batch partial-merge operator (``operators/incremental.py``) to a
stream: each micro-batch is aggregated to partial form (count/sum/min/max
— a batch-local, map-side-combined reduction) and merged into a
maintained partial table via ``foreachBatch``.  This is the
materialized-view pattern for append-only streams: per batch the work is
O(|batch| + |groups|), the maintained table is one row per group, and a
full-history recomputation never happens.

The maintained table lives in parquet (path-addressed), written
atomically per batch to a versioned subdirectory with a pointer file —
``foreachBatch`` can re-deliver a batch on recovery, so the merge must be
idempotent: the pointer records the last applied batch id, and a re-run
of the same batch id is skipped (classic exactly-once-over-at-least-once
sink discipline; the same contract the engine's JDBC/ILP sinks document).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from big_data_engineering_financial_analysis_spark.operators.incremental import (
    merge_partials,
    to_partials,
)


class RollupSink:
    """foreachBatch target maintaining a merged partial table at ``path``."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        value_col: str,
    ) -> None:
        self.spark = spark
        self.path = path
        self.keys = keys
        self.value_col = value_col

    # -- pointer bookkeeping -------------------------------------------------
    def _pointer(self) -> dict:
        p = os.path.join(self.path, "_POINTER.json")
        if os.path.exists(p):
            with open(p) as fh:
                return json.load(fh)
        return {"epoch": -1, "version": -1}

    def _commit(self, epoch: int, version: int) -> None:
        p = os.path.join(self.path, "_POINTER.json")
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"epoch": epoch, "version": version}, fh)
        os.replace(tmp, p)  # atomic on POSIX

    def current(self) -> DataFrame | None:
        ptr = self._pointer()
        if ptr["version"] < 0:
            return None
        return self.spark.read.parquet(
            os.path.join(self.path, f"v{ptr['version']}")
        )

    # -- the foreachBatch hook ----------------------------------------------
    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        ptr = self._pointer()
        if epoch_id <= ptr["epoch"]:
            return  # redelivered batch: already merged, skip (idempotence)
        delta = to_partials(batch_df, self.keys, self.value_col)
        base = self.current()
        merged = delta if base is None else merge_partials(base, delta, self.keys)
        version = ptr["version"] + 1
        merged.write.mode("overwrite").parquet(
            os.path.join(self.path, f"v{version}")
        )
        self._commit(epoch_id, version)
        self._prune(keep_from=version - 1)

    def _prune(self, keep_from: int) -> None:
        """Delete snapshots older than ``keep_from`` — a resident stream
        would otherwise accumulate one full copy of the partial table per
        micro-batch.  The previous version is kept so a reader holding the
        old pointer (or a crash mid-commit) never dangles."""
        import shutil

        for name in os.listdir(self.path):
            if name.startswith("v") and name[1:].isdigit():
                if int(name[1:]) < keep_from:
                    shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)


def maintain_rollup(
    stream: DataFrame,
    sink: RollupSink,
    checkpoint: str,
):
    """Attach the rollup sink to a stream; returns the StreamingQuery."""
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
