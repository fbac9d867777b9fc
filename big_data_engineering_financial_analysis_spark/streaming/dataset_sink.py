"""Streaming → at-rest dataset sink with zone-map + Bloom maintenance.

Completes the ingest story: micro-batches append into the Hive-
partitioned, within-file-sorted layout of ``sources/dataset.py`` and
each commit incrementally extends the zone-map manifest
(``sources/zonemap.py`` — O(new files) footer scans) and, optionally,
the Bloom sidecar (``sources/bloomskip.py`` — O(new files) column
scans), so serving-side range reads AND point lookups keep skipping
files as the stream grows.

Exactly-once notes (the same contract as the engine's other foreachBatch
sinks): Structured Streaming may REPLAY a batch id after a crash.  A
plain parquet append would duplicate the replayed rows, so the sink
keeps a tiny ``_batches/<id>`` marker directory per committed batch and
skips ids it has already seen — the standard idempotent-foreachBatch
recipe.  The marker is written AFTER the data commit: a crash between
the two leaves a replayed batch appending twice only if the first
attempt's files are also visible, which plain-directory parquet cannot
guarantee transactionally — the compactor (``compact_dataset``) plus
exact dedup downstream is the engine's documented answer, as for any
filesystem table without a log-backed format underneath.

The reference's equivalent is the kafka-to-questdb consumer appending
rows into the daily-partitioned ``stock_data`` table
(services/kafka-to-questdb/consumer.py:46-80); this is the engine-native
generalization with file skipping on top.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame

#: writer ids must survive the marker-name contract: no leading "_"
#: (the committed-batch counters and describe_dataset skip _-prefixed
#: marker names — an "_backfill" writer would be invisible to snapshot
#: cadence), no path separators (a nested marker dir breaks listings),
#: no whitespace.
_WRITER_ID_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9.\-]*$")


def _marker_name(writer_id: str | None, batch_id: int) -> str:
    """The (writer_id, batch_id) replay-marker name — THE cross-sink
    contract (webdataset / dedup-store / cluster-store sinks all share
    it): batch ids are only unique within one query's checkpoint, so
    each distinct (query, checkpoint) incarnation appending to a store
    needs its own writer_id or its early batches collide with the first
    writer's markers and are silently skipped as replays.  ``None``
    keeps the legacy single-writer layout."""
    if writer_id is None:
        return str(batch_id)
    if not _WRITER_ID_RE.match(writer_id):
        raise ValueError(
            f"writer_id {writer_id!r} must match {_WRITER_ID_RE.pattern} "
            "(no leading underscore — such markers are invisible to the "
            "committed-batch counters — and no separators/whitespace)"
        )
    return f"{writer_id}-{batch_id}"


def dataset_sink(
    path: str,
    partition_cols: list[str],
    sort_cols: list[str],
    zonemap_cols: list[str] | None = None,
    max_records_per_file: int | None = None,
    bloom_cols: list[str] | None = None,
    snapshot_every: int | None = None,
    align_schema: bool = False,
    writer_id: str | None = None,
):
    """Build a ``foreachBatch`` function appending micro-batches into a
    sharded dataset, maintaining the zone-map manifest per commit.

    Use as ``stream.writeStream.foreachBatch(dataset_sink(...))``.

    ``writer_id`` scopes the replay-dedup markers: batch ids are only
    unique within ONE query's checkpoint, so every distinct
    (query, checkpoint) incarnation appending to the same dataset — a
    schema-evolved restart with a fresh checkpoint, a backfill job, a
    second topic — must pass its own id or its early batches collide
    with the first writer's markers and are silently skipped as
    replays.  ``None`` keeps the legacy single-writer marker layout.
    CONCURRENCY LIMIT: writer ids make sequential incarnations and
    concurrent plain APPENDS safe, but ``snapshot_every`` stays
    single-ACTIVE-writer — `commit_snapshot` is a single-writer mutator
    (its tmp-reaping and version numbering race a concurrent committer),
    so run snapshot cadence on at most one live query per dataset and
    give other concurrent writers ``snapshot_every=None``.

    ``align_schema=True`` aligns every batch onto the dataset's standing
    merged schema before the append (``sources/evolution.py``): lossless
    widening, typed-NULL backfill, new columns appended, lossy drift
    fails the query loudly instead of writing a footer that bricks
    future merged reads.

    ``snapshot_every=N`` pins a snapshot version (`sources/snapshots.py`,
    hardlinks — zero data bytes) after every Nth committed batch: the
    stream's consumers get consistent, immutable cut points ("train on
    the corpus as of batch 400") that survive later compactions of the
    live tree.  Cadence counts committed batches (markers), not batch
    ids, so restart gaps don't skew it; the due-cut cursor is persisted
    (``_batches/_snap_cursor``) and checked on EVERY call including
    replays, so a crash between a batch's marker and its snapshot is
    healed at the next call (the cut lands one batch late, never
    silently skipped).  The committed-batch count is kept in memory per
    sink instance and re-derived from one directory listing per restart
    — O(1) per batch, not O(stream age).

    Durability window (user-facing contract, see module doc): the
    ``_batches/<id>`` marker is written AFTER the parquet append and
    zone-map update, so a crash landing exactly between data commit and
    marker creation makes the replayed batch append twice; markers live
    on the driver-local filesystem.  Both are accepted limits of the
    plain-directory contract — run :func:`..sources.dataset.compact_dataset`
    periodically and keep exact dedup downstream, or use a log-backed
    table format when genuine transactional appends are required.
    """
    from big_data_engineering_financial_analysis_spark.sources import bloomskip as bs
    from big_data_engineering_financial_analysis_spark.sources import dataset as ds
    from big_data_engineering_financial_analysis_spark.sources import zonemap as zm

    if snapshot_every is not None and snapshot_every < 1:
        raise ValueError(f"snapshot_every must be >= 1, got {snapshot_every}")

    markers_dir = os.path.join(path, "_batches")
    cursor_file = os.path.join(markers_dir, "_snap_cursor")
    # per-instance; n_committed re-derived once per restart, align target
    # resolved once per restart (a stream's batch schema is FIXED for the
    # query's lifetime, so one merged-schema read covers every batch)
    state = {"n_committed": None, "align_target": None}

    def _n_committed() -> int:
        if state["n_committed"] is None:
            state["n_committed"] = (
                sum(1 for n in os.listdir(markers_dir) if not n.startswith("_"))
                if os.path.isdir(markers_dir)
                else 0
            )
        return state["n_committed"]

    def _maybe_snapshot(batch_id: int) -> None:
        """Commit any DUE cut.  Runs on every call (replays included), so
        a crash between marker and snapshot heals at the next call."""
        due = _n_committed() // snapshot_every
        try:
            with open(cursor_file) as fh:
                done = int(fh.read().strip())
        except (OSError, ValueError):
            done = 0
        if due > done:
            from big_data_engineering_financial_analysis_spark.sources import snapshots as sn

            sn.commit_snapshot(path, note=f"batch {batch_id}")
            tmp = cursor_file + f".tmp.{os.getpid()}"
            with open(tmp, "w") as fh:
                fh.write(str(due))
            os.replace(tmp, cursor_file)

    _marker_name(writer_id, 0)  # validate at construction, not first batch

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(
            path, "_batches", _marker_name(writer_id, batch_id)
        )
        if os.path.exists(marker):
            if snapshot_every is not None:
                _maybe_snapshot(batch_id)  # heal a crash-skipped cut
            return  # replayed batch: already committed, idempotent skip
        if snapshot_every is not None:
            _n_committed()  # initialize BEFORE this batch's marker exists
        if align_schema:
            # schema-evolution guard for long-lived ingest: a RESTARTED
            # stream whose producer drifted a column's type (int where
            # the dataset holds long) would append a footer that bricks
            # every future mergeSchema read — align each batch onto the
            # dataset's standing types (lossless widening, typed-NULL
            # backfill, new columns appended; sources/evolution.py).
            # Resolved once per sink instance: batch schemas are fixed
            # per query, and alignment is schema-only when nothing drifts
            if state["align_target"] is None and zm._data_files(path):
                from pyspark.sql import types as T

                from big_data_engineering_financial_analysis_spark.sources import evolution as ev

                merged = ev.dataset_schema(batch_df.sparkSession, path)
                # partition columns are EXEMPT from the target: their
                # merged-read types come from DIRECTORY-NAME inference
                # (footers don't store them), which can legally narrow —
                # a long day_id reads back as int, a date-shaped string
                # as date — and aligning against that would refuse a
                # perfectly consistent producer from batch 1 onward.
                # They pass through as the batch's own columns instead
                # (the same exemption the skip indexes apply).
                state["align_target"] = T.StructType(
                    [f for f in merged.fields if f.name not in partition_cols]
                )
            if state["align_target"] is not None:
                from big_data_engineering_financial_analysis_spark.sources import evolution as ev

                batch_df = ev.align_to_dataset(batch_df, state["align_target"])
        # ONE write path with the batch API: write_sharded owns the
        # layout (shuffle + per-task sort + maxRecordsPerFile), the flat
        # partition_cols=[] case, and the TIMESTAMP_MICROS pin — whose
        # set-and-keep form is specifically what makes CONCURRENT
        # streaming queries on one session safe (a save/restore here
        # raced: one sink's finally unset the key mid-write of another,
        # silently emitting stats-less INT96 files).
        ds.write_sharded(
            batch_df,
            path,
            partition_cols,
            sort_cols,
            max_records_per_file=max_records_per_file,
            mode="append",
        )
        # bound sidecar maintenance to the partitions THIS batch touched
        # (one tiny distinct job over the batch's partition columns):
        # O(touched) shard reads+writes instead of O(partitions).  Any
        # escaping mismatch with Spark's own directory naming degrades to
        # the full update (never to a wrong manifest — an unmaintained
        # shard's files are simply kept by the prune).
        touched: list[str] | None = None
        if (zonemap_cols or bloom_cols) and partition_cols:
            from big_data_engineering_financial_analysis_spark.sources.zonemap import _hive_escape

            touched = [
                "/".join(
                    f"{c}="
                    + (
                        "__HIVE_DEFAULT_PARTITION__"
                        if r[c] is None
                        else _hive_escape(str(r[c]))
                    )
                    for c in partition_cols
                )
                for r in batch_df.select(*partition_cols).distinct().collect()
            ]
            if any(not os.path.isdir(os.path.join(path, d)) for d in touched):
                touched = None  # escaping mismatch: full update instead
        # dirs-bounded maintenance requires explicit cols (the updaters
        # reject dirs with cols=[] — a new partition's shard can't infer
        # coverage); cols=[] keeps its historical meaning of "maintain
        # whatever the existing manifest covers" via the full update.
        if zonemap_cols is not None:
            zm.update_zonemap(
                path, zonemap_cols, dirs=touched if zonemap_cols else None
            )
        if bloom_cols is not None:
            # equality-skipping twin of the zone-map update: O(new files)
            # column-projected scans extend the Bloom sidecar so serving-
            # side point lookups keep skipping as the stream grows —
            # distributed, because the one legitimately LARGE update (a
            # format-bump or manifest-loss full rebuild) must not stall a
            # micro-batch behind a driver-sequential corpus scan
            bs.update_bloom_index(
                path,
                bloom_cols,
                spark=batch_df.sparkSession,
                dirs=touched if bloom_cols else None,
            )
        os.makedirs(marker, exist_ok=True)
        if snapshot_every is not None:
            state["n_committed"] += 1
            _maybe_snapshot(batch_id)

    return write_batch
