"""Sharded dataset writer + pruned reader — the at-rest layout layer.

The reference's at-rest store is a QuestDB table with a designated
timestamp and daily partitions (db/init_questdb.sql:20-21).  The engine's
parquet-native equivalent makes the two layout decisions that dominate
100 TB scan cost explicit:

* **directory partitioning** on low-cardinality columns (``lang=...``,
  ``dt=...``): partition pruning removes whole directories from a scan
  before any IO — the parquet analogue of QuestDB's ``PARTITION BY DAY``;
* **clustering**: rows are shuffled so each Hive partition is written by
  dedicated tasks (no small-file explosion: without the repartition every
  upstream task writes a file into every partition directory — tasks x
  partitions files), and sorted within files on a clustering key so
  parquet row-group min/max statistics prune reads within a partition
  (the poor man's z-order for a single key).

``read_dataset`` is a plain partition-aware scan; the proof obligations
(PartitionFilters in the plan, pruned ``inputFiles()``, per-file
sortedness) live in ``tests/test_dataset.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_sharded(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str],
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a Hive-partitioned, within-file-sorted parquet
    dataset.  One shuffle (on the partition columns) + a per-task sort;
    ``partition_cols=[]`` writes the FLAT (unpartitioned) layout the
    sidecar/prune layers already support.

    Timestamps are written as TIMESTAMP_MICROS, not Spark's default
    legacy INT96: INT96 columns carry NO parquet min/max statistics, so
    a time-sorted layout would be unprunable — no row-group skipping
    inside files and nothing for the zone-map manifest to read.  (Found
    when the round-6 skip-and-serve test saw empty footer zones.)

    The conf override is SET-AND-KEEP, deliberately not save/restore: a
    try/finally restore is a session-global race when two streaming
    queries share one SparkSession (A's finally unsets the key while B's
    write runs → B silently emits INT96 files whose time columns vanish
    from zone-map and row-group pruning — the exact trap the override
    exists to prevent).  ``get_spark`` pins MICROS session-wide anyway;
    a caller who truly needs INT96 sets it back after the write."""
    df.sparkSession.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    out = df.repartition(*partition_cols) if partition_cols else df
    if partition_cols or sort_cols:
        out = out.sortWithinPartitions(*partition_cols, *sort_cols)
    writer = out.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def compact_dataset(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str],
    max_records_per_file: int | None = None,
    snapshot_before: bool = False,
    zorder_cols: list[str] | None = None,
    zorder_files: int = 32,
    cast_cols: dict[str, str] | None = None,
) -> None:
    """Rewrite a dataset into consolidated, re-sorted files.

    ``cast_cols`` promotes column types during the rewrite (``{"id":
    "long"}``) — the one sanctioned way to WIDEN a dataset whose
    producers outgrew a type (``evolution.align_to_dataset`` refuses
    lossy narrowing at append time and points here).  Only lossless
    widenings are allowed (the same ``_WIDEN`` whitelist): compaction
    must never corrupt values it is consolidating.

    The rewrite reads with ``mergeSchema`` and is therefore also the
    SCHEMA-NORMALIZATION step for an evolved dataset
    (``sources/evolution.py``): after compaction every file carries the
    union schema (evolution gaps materialized as real NULL columns), so
    plain un-merged reads see every column again and the per-append
    merged-read tax disappears — evolve cheaply, normalize when the
    rewrite is worth it anyway.

    ``zorder_cols`` routes the rewrite through the Morton layout
    (``operators/layout.write_zordered`` semantics, composed with Hive
    partitioning: range-partition on (partition_cols..., zkey) so files
    within each partition are z-clustered): streaming appends rot ANY
    clustering, and compaction is exactly where the multi-dimensional
    layout gets restored.  ``sort_cols`` is ignored in that mode (the
    z-key IS the sort).

    Streaming sinks append one small file per micro-batch per partition;
    at 100 TB that rots scans with file-open overhead and dead row-group
    stats.  Compaction = read -> recluster -> swap.  Plain directories
    offer no single atomic swap, so the protocol is two renames with a
    crash-recovery prefix instead (single-writer assumption, like any
    filesystem-table compactor without a real table format underneath):

    * normal: stage rewrite -> rename live aside -> rename stage in ->
      delete the aside copy.  Readers see either the old or new dataset
      except during the instant between the renames; a reader in that
      window gets path-not-found and should retry (never partial data).
    * crash between the renames leaves only ``<path>._pre_compact``;
      the next call (or any caller of :func:`recover_compaction`)
      restores it before doing anything else.
    * crash after the second rename leaves a stale aside copy; it is
      deleted on the next call.

    ``snapshot_before=True`` pins the pre-compaction file set as a
    snapshot version first (`sources/snapshots.py` — hardlinks, zero data
    bytes), making the compaction fully REVERSIBLE and giving in-flight
    pinned readers a tree the swap cannot disturb; expire it with
    :func:`snapshots.expire_snapshots` once the new layout is trusted.
    """
    import shutil
    import tempfile

    recover_compaction(path)
    if snapshot_before:
        from big_data_engineering_financial_analysis_spark.sources import snapshots as _sn

        _sn.commit_snapshot(path, note="pre-compaction")
    parent = os.path.dirname(os.path.abspath(path))
    # prefix carries the dataset name so recover_compaction of one dataset
    # never reaps a sibling dataset's in-flight stage in a shared parent
    tmp = tempfile.mkdtemp(
        prefix=f"_compact_{os.path.basename(os.path.abspath(path))}_",
        dir=parent,
    )
    staged = os.path.join(tmp, "data")
    # mergeSchema: an evolved dataset must compact to its UNION schema —
    # a sampled-footer read could silently drop post-evolution columns
    # from the rewrite (footer IO is noise next to the rewrite itself)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if cast_cols:
        from pyspark.sql import types as T

        from big_data_engineering_financial_analysis_spark.sources.evolution import align_to_dataset

        have = {f.name for f in df.schema.fields}
        for col in cast_cols:
            if col not in have:
                raise ValueError(f"cast_cols: no column {col!r} in {path!r}")
        # promotion IS alignment onto the widened target — one home for
        # the lossless-widening whitelist (align_to_dataset refuses
        # anything lossy; compaction must never corrupt values it is
        # consolidating)
        target = T.StructType(
            [
                T.StructField(
                    f.name,
                    T._parse_datatype_string(cast_cols[f.name])
                    if f.name in cast_cols
                    else f.dataType,
                    f.nullable,
                )
                for f in df.schema.fields
            ]
        )
        df = align_to_dataset(df, target, allow_new_columns=False)
    if zorder_cols:
        from big_data_engineering_financial_analysis_spark.operators.layout import write_zordered

        write_zordered(
            df,
            staged,
            zorder_cols,
            n_files=zorder_files,
            partition_cols=partition_cols,
            zonemap=False,  # sidecar rebuild below keeps its own columns
        )
    else:
        write_sharded(
            df, staged, partition_cols, sort_cols,
            max_records_per_file=max_records_per_file,
        )
    # a zone-map manifest would die with the pre-compaction copy (file
    # names all change); rebuild it on the staged data BEFORE the swap so
    # manifest and files go live atomically together, same columns
    from big_data_engineering_financial_analysis_spark.sources import zonemap as _zm

    old_manifest = _zm.load_zonemap(path)
    if old_manifest:
        cols = sorted({c for zones in old_manifest.values() for c in zones})
        if cols:
            # distributed footer scan (r10): sequential driver IO on the
            # full staged tree is the one remaining O(all files) driver
            # pass the compactor performed
            _zm.build_zonemap(staged, cols, spark=spark)
    # same contract for the Bloom sidecar: rebuild on the staged files so
    # point-lookup pruning survives the swap instead of silently
    # degrading to full scans until the next manual build
    from big_data_engineering_financial_analysis_spark.sources import bloomskip as _bs

    # raw read (any manifest format): which columns were bloom-indexed and
    # at what sizing is hash-scheme independent, so a format-bumped legacy
    # sidecar still gets rebuilt fresh (at the current format) instead of
    # silently dropping point-lookup pruning after the compaction
    old_blooms = _bs._raw_manifest_files(path)
    if old_blooms:
        # preserve each column's observed (m, k) — an upsized hot column
        # must not reset to defaults — and distribute the rebuild: this
        # is the largest bloom scan the system performs (every staged
        # file), exactly what the executor-parallel path exists for
        sizing = _bs._sizing_from_manifest(old_blooms)
        if sizing:
            _bs.build_bloom_index(
                staged, sorted(sizing), spark=spark, sizing=sizing
            )
    # the streaming sink's replay markers (_batches/<id>) must survive
    # compaction: losing them would make a post-compaction crash replay
    # re-append an already-committed micro-batch
    markers = os.path.join(path, "_batches")
    if os.path.isdir(markers):
        shutil.copytree(markers, os.path.join(staged, "_batches"))
    old = path + "._pre_compact"
    os.rename(path, old)
    os.rename(staged, path)
    # manifest-mode snapshots pin pre-compaction files by FILE LIST, not
    # by inode — move any still-pinned file into the snapshot layer's
    # retained pool before the aside copy dies (hardlink-mode snapshots
    # need nothing here; zero-cost no-op when no manifests exist)
    from big_data_engineering_financial_analysis_spark.sources import snapshots as _snx

    _snx.preserve_replaced_tree(path, old)
    shutil.rmtree(old)
    shutil.rmtree(tmp, ignore_errors=True)


def compact_partition(
    spark: SparkSession,
    path: str,
    dir_rel: str,
    sort_cols: list[str],
    n_files: int = 1,
    max_records_per_file: int | None = None,
    snapshot_before: bool = False,
) -> None:
    """Compact ONE partition directory in place — the operational form
    at 100 TB, where "rewrite the dataset" is never the answer: a
    streaming sink rots exactly the partitions it appends to, so the
    compactor should pay exactly those.  Cost: a rewrite of ``dir_rel``
    alone plus O(this partition) sidecar maintenance; every other
    partition's files, shard manifests, and mtimes are untouched.

    Protocol: the dataset-level two-rename swap, scoped to the
    partition.  The aside lives under ``<path>._pre_compact_part/`` as a
    ROOT-MIRRORING tree (so manifest-mode snapshot pins resolve their
    dataset-relative paths against it — ``preserve_replaced_tree``
    moves still-pinned replaced files into the retained pool before the
    aside dies, same as the full compactor).  A crash at any point heals
    via :func:`recover_partition_compaction` (called up front here).

    Sidecar maintenance is dirs-bounded: each index's columns are taken
    from THIS partition's shard manifest (falling back to a full update
    when the manifest is legacy flat), so the refresh reads only the
    rewritten files.  Single-writer, like every mutator in this layer —
    pause the partition's streaming sink for the swap instant (the sink
    retries the next batch; replay markers live at the root, untouched).
    """
    import shutil
    import tempfile

    recover_partition_compaction(path)
    # normalize FIRST: '.', './x', 'x/', 'a/../..' must not dodge the
    # guards below ('.' would swap the WHOLE dataset through the
    # partition path — deleting root _batches replay markers, manifests
    # and _snapshots with the aside; '..' would escape the dataset)
    norm = os.path.normpath(dir_rel) if dir_rel else ""
    if norm in ("", ".", "/") or not dir_rel.strip("/"):
        raise ValueError(
            "dir_rel must name a partition directory; got an empty path "
            "(use compact_dataset to rewrite the whole dataset)"
        )
    if os.path.isabs(norm) or norm.split(os.sep)[0] == "..":
        raise ValueError(
            f"dir_rel must be a relative path inside the dataset; got {dir_rel!r}"
        )
    dir_rel = norm
    src = os.path.join(path, dir_rel)
    if not os.path.isdir(src):
        raise FileNotFoundError(f"no partition directory {dir_rel!r} in {path!r}")
    # leaf check: a non-leaf dir_rel (e.g. 'year=2024' over nested
    # 'month=...' dirs) would make the scoped read partition-discover the
    # sub-keys and rewrite them as DATA columns in flat files, leaving
    # the dataset root with conflicting directory depths (unreadable)
    subparts = sorted(
        d for d in os.listdir(src)
        if os.path.isdir(os.path.join(src, d)) and "=" in d
    )
    if subparts:
        raise ValueError(
            f"{dir_rel!r} is not a leaf partition directory — it contains "
            f"nested partition dirs {subparts[:3]}; compact each leaf "
            "(e.g. " + os.path.join(dir_rel, subparts[0]) + ") instead"
        )
    if snapshot_before:
        from big_data_engineering_financial_analysis_spark.sources import snapshots as _sn

        _sn.commit_snapshot(path, note=f"pre-compaction {dir_rel}")
    from big_data_engineering_financial_analysis_spark.sources import bloomskip as _bs
    from big_data_engineering_financial_analysis_spark.sources import zonemap as _zm

    # capture THIS partition's sidecar coverage BEFORE the swap: the
    # shard manifests live inside the partition directory and leave with
    # the aside, so reading them afterwards would find nothing and
    # silently skip the refresh
    zroot = _zm._read_obj(os.path.join(path, _zm.MANIFEST_NAME))
    zcols: list[str] = []
    z_sharded = bool(zroot is not None and _zm._is_sharded(zroot))
    if zroot is not None:
        zsrc = (
            _zm._shard_zones(path, dir_rel)
            if z_sharded
            else (_zm.load_zonemap(path) or {})
        )
        zcols = sorted({c for zones in zsrc.values() for c in zones})
    broot = _bs._read_manifest_obj(os.path.join(path, _bs.MANIFEST_NAME))
    b_sharded = bool(broot is not None and broot.get("sharded"))
    bsrc = (
        _bs._shard_files(path, dir_rel, format_gated=False)
        if b_sharded
        else (_bs._raw_manifest_files(path) or {})
    )
    sizing = _bs._sizing_from_manifest(bsrc)
    parent = os.path.dirname(os.path.abspath(path))
    tmp = tempfile.mkdtemp(
        prefix=f"_compactp_{os.path.basename(os.path.abspath(path))}_",
        dir=parent,
    )
    staged = os.path.join(tmp, "data")
    # plain read of the one dir: partition values stay in the PATH (the
    # files must not absorb the partition column); mergeSchema so an
    # evolved partition normalizes exactly like the full compactor
    df = spark.read.option("mergeSchema", "true").parquet(src)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    out = df.repartition(max(1, n_files))
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(staged)
    aside_root = path + "._pre_compact_part"
    aside_dir = os.path.join(aside_root, dir_rel)
    os.makedirs(os.path.dirname(aside_dir) or aside_root, exist_ok=True)
    os.rename(src, aside_dir)
    os.rename(staged, src)
    from big_data_engineering_financial_analysis_spark.sources import snapshots as _snx

    _snx.preserve_replaced_tree(path, aside_root)
    shutil.rmtree(aside_root)
    shutil.rmtree(tmp, ignore_errors=True)
    # dirs-bounded sidecar refresh with the pre-swap coverage (until it
    # runs the new files are simply unpruned — conservative, never wrong)
    if zcols:
        if z_sharded:
            _zm.update_zonemap(path, zcols, dirs=[dir_rel])
        else:
            _zm.update_zonemap(path, zcols)
    if sizing:
        # thread the pre-swap (m, k) capture through: the dirs branch's
        # per-leaf sizing inheritance reads the shard manifest, which
        # left with the aside — without the seed a deliberately upsized
        # hot column would be rebuilt at DEFAULT sizing (advice r9)
        if b_sharded:
            _bs.update_bloom_index(
                path, sorted(sizing), spark=spark, dirs=[dir_rel], sizing=sizing
            )
        else:
            _bs.update_bloom_index(path, sorted(sizing), spark=spark, sizing=sizing)


def recover_partition_compaction(path: str) -> None:
    """Heal a crashed :func:`compact_partition`.

    For each partition directory present in the aside tree: live dir
    missing means the crash hit between the two renames — restore the
    aside as live; live dir present means the swap completed — the aside
    is superseded (still-pinned files are preserved into the snapshot
    pool first, re-running the step a crash may have interrupted).
    Leaked ``_compactp_*`` stage dirs are reaped."""
    import shutil

    aside_root = path + "._pre_compact_part"
    if os.path.isdir(aside_root):
        # materialize the leaf list BEFORE renaming (os.renames prunes
        # emptied parents, which would corrupt a live os.walk)
        leaves = [
            dirpath for dirpath, _dirs, files in os.walk(aside_root) if files
        ]
        for dirpath in leaves:
            rel = os.path.relpath(dirpath, aside_root)
            live = os.path.join(path, rel)
            if not os.path.isdir(live):
                os.renames(dirpath, live)
        if os.path.isdir(aside_root):
            from big_data_engineering_financial_analysis_spark.sources import snapshots as _snx

            _snx.preserve_replaced_tree(path, aside_root)
            shutil.rmtree(aside_root)
    parent = os.path.dirname(os.path.abspath(path))
    prefix = f"_compactp_{os.path.basename(os.path.abspath(path))}_"
    if os.path.isdir(parent):
        for name in os.listdir(parent):
            if name.startswith(prefix):
                shutil.rmtree(os.path.join(parent, name), ignore_errors=True)


def recover_compaction(path: str) -> None:
    """Heal a crashed :func:`compact_dataset` run.

    Only-aside-exists -> the crash hit between the two renames: restore
    the aside copy as live.  Both-exist -> the crash hit after the swap:
    the aside copy is superseded, delete it."""
    import shutil

    from big_data_engineering_financial_analysis_spark.sources.localfs import recover_aside_swap

    aside = path + "._pre_compact"
    # both-exist = crash in compact_dataset's post-swap window, possibly
    # BEFORE preserve_replaced_tree finished: the aside copy may hold the
    # only bytes of files that manifest-mode snapshots still pin, and
    # recover_aside_swap is about to delete it.  Re-run the preserve step
    # first (idempotent: skips already-retained and still-live files) so
    # a crash here can never turn a pinned read into a permanent
    # immutability-contract failure.
    if os.path.exists(aside) and os.path.exists(path):
        from big_data_engineering_financial_analysis_spark.sources import snapshots as _snx

        _snx.preserve_replaced_tree(path, aside)
    recover_aside_swap(path, aside)
    # A crash BEFORE the first rename (e.g. mid-Spark-write) leaks the
    # staged ``_compact_*`` tempdir; repeated crashed compactions would
    # accumulate full-dataset-sized orphans.  The stage dir only becomes
    # live via its rename, so any that still exists is garbage.
    parent = os.path.dirname(os.path.abspath(path))
    prefix = f"_compact_{os.path.basename(os.path.abspath(path))}_"
    if os.path.isdir(parent):
        for name in os.listdir(parent):
            if name.startswith(prefix):
                shutil.rmtree(os.path.join(parent, name), ignore_errors=True)


def describe_dataset(path: str) -> dict:
    """Operational snapshot of a dataset directory from METADATA only —
    parquet footers, sidecar manifests, marker dirs; zero row IO.  The
    ops-facing answer to "what state is this store in?": file count and
    bytes, row count (footer num_rows, exact), Hive partition keys,
    which skip indexes exist and their coverage, streaming-commit and
    snapshot status.  O(files) footer reads — cheap at any row scale."""
    import pyarrow.parquet as pq

    from big_data_engineering_financial_analysis_spark.sources import bloomskip as _bs
    from big_data_engineering_financial_analysis_spark.sources import snapshots as _sn
    from big_data_engineering_financial_analysis_spark.sources import zonemap as _zm

    files = _zm._data_files(path)
    rows = 0
    bytes_total = 0
    partitions: set[str] = set()
    schemas: set[tuple] = set()
    data_cols: set[str] = set()
    for fpath in files:
        meta = pq.ParquetFile(fpath).metadata
        rows += meta.num_rows
        bytes_total += os.path.getsize(fpath)
        sig = tuple(
            (meta.schema.column(i).name, meta.schema.column(i).physical_type)
            for i in range(meta.num_columns)
        )
        schemas.add(sig)
        data_cols.update(name for name, _t in sig)
        for part in os.path.relpath(fpath, path).split(os.sep)[:-1]:
            if "=" in part:
                partitions.add(part.split("=", 1)[0])
    zones = _zm.load_zonemap(path) or {}
    zone_root = _zm._read_obj(os.path.join(path, _zm.MANIFEST_NAME))
    blooms = _bs.load_bloom_index(path) or {}
    bloom_root = _bs._read_manifest_obj(os.path.join(path, _bs.MANIFEST_NAME))
    snap_versions = _sn.snapshot_versions(path)
    snap_modes = {}
    for v in snap_versions:
        try:
            snap_modes[v] = _sn.snapshot_meta(path, v).get("mode", "link")
        except OSError:
            snap_modes[v] = "unknown"
    pool = os.path.join(_sn._snap_root(path), _sn._RETAINED)
    retained_files = (
        sum(
            1
            for _r, _d, fs in os.walk(pool)
            for f in fs
            if f.endswith(".parquet")
        )
        if os.path.isdir(pool)
        else 0
    )
    markers_dir = os.path.join(path, "_batches")
    n_batches = (
        sum(1 for n in os.listdir(markers_dir) if not n.startswith("_"))
        if os.path.isdir(markers_dir)
        else 0
    )
    rels = {os.path.relpath(f, path) for f in files}
    return {
        "files": len(files),
        "rows": rows,
        "bytes": bytes_total,
        # >1 footer schemas = the dataset has EVOLVED (read it merged;
        # the next compaction normalizes it back to one)
        "footer_schemas": len(schemas),
        "data_cols": sorted(data_cols),
        "partition_cols": sorted(partitions),
        "zonemap_cols": sorted({c for z in zones.values() for c in z}),
        "zonemap_coverage": len(rels & set(zones)),
        "zonemap_sharded": bool(zone_root and _zm._is_sharded(zone_root)),
        "bloom_cols": sorted({c for b in blooms.values() for c in b}),
        "bloom_coverage": len(rels & set(blooms)),
        "bloom_sharded": bool(bloom_root and bloom_root.get("sharded")),
        "committed_batches": n_batches,
        "snapshots": snap_versions,
        "snapshot_modes": snap_modes,
        "snapshot_retained_files": retained_files,
        "pending_compaction_recovery": os.path.exists(path + "._pre_compact"),
    }


def read_dataset(
    spark: SparkSession, path: str, merge_schema: bool = False
) -> DataFrame:
    """Partition-aware scan: equality/IN filters on the partition columns
    prune directories (PartitionFilters), filters on sorted data columns
    prune row groups via parquet statistics (PushedFilters).

    ``merge_schema=True`` reads the union schema of a schema-EVOLVED
    dataset (``sources/evolution.py``): files that predate a column
    contribute NULL for it.  Off by default — merged schema inference
    reads every footer, which an un-evolved dataset needn't pay."""
    from big_data_engineering_financial_analysis_spark.sources.zonemap import _reader

    return _reader(spark, merge_schema).parquet(path)
