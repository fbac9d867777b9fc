"""File-level zone maps — external min/max manifest for data skipping.

Parquet row-group statistics already prune WITHIN a file once the
scheduler has opened it; at 100 TB the bigger win is never scheduling
the file at all.  Lakehouse table formats (Iceberg/Delta) do this with
per-file min/max column stats in a manifest; this module is that
pattern over plain parquet directories, composing with the dataset
layer's Hive partition pruning (`sources/dataset.py`):

* :func:`build_zonemap` reads every data file's parquet FOOTER (pyarrow,
  no row IO) and writes ``_zonemap.json``: file -> column -> [min, max].
  Cost: one footer read per file — run it right after `write_sharded` /
  `compact_dataset`, whose per-file sort on the clustering key is what
  makes the zones narrow and therefore selective.
* :func:`read_pruned` lists the directory, drops every file whose
  [min, max] zone is disjoint from the requested range, and hands the
  survivors to one `spark.read.parquet(*files)` scan — the residual
  filter is still applied, so the result ALWAYS equals a full scan +
  filter (pruning is an optimization, never a semantics change).

Safety rules (all tested):
* a file not in the manifest (appended after the build) is kept;
* a manifest entry without stats for the column is kept;
* manifest entries for deleted files are ignored (the directory listing
  is the source of truth);
* all-NULL columns store a null zone: RANGE requests drop the file
  (no value can match), but a boundless read keeps it — its rows are
  part of the dataset;
* a bound that cannot be compared with the stored stat type (e.g. a
  datetime bound against date stats) keeps the file — the residual
  filter decides, exactly as a plain scan would.

The reference has no at-rest pruning beyond QuestDB's daily partitions
(db/init_questdb.sql:20-21); this is the engine-native generalization.
"""

from __future__ import annotations

import datetime as dt
import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_zonemap.json"


def _encode(v: Any):
    """JSON-encode a parquet statistics value, tagging non-JSON types."""
    if isinstance(v, dt.datetime):
        return {"$ts": v.isoformat()}
    if isinstance(v, dt.date):
        return {"$date": v.isoformat()}
    if isinstance(v, bytes):
        return {"$hex": v.hex()}
    return v


def _decode(v: Any):
    if isinstance(v, dict):
        if "$ts" in v:
            return dt.datetime.fromisoformat(v["$ts"])
        if "$date" in v:
            return dt.date.fromisoformat(v["$date"])
        if "$hex" in v:
            return bytes.fromhex(v["$hex"])
    return v


def _data_files(path: str) -> list[str]:
    out = []
    for root, dirs, files in os.walk(path):
        # mirror Spark's file-index convention: a `_`/`.`-prefixed
        # DIRECTORY is metadata, not data — never descend (else snapshot
        # trees under _snapshots/ would double-count into zone/bloom
        # manifests and prune decisions)
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                out.append(os.path.join(root, f))
    return sorted(out)


def _file_zones(fpath: str, cols: list[str]) -> dict:
    """One file's footer scan: column -> [min, max] / None (all-NULL) /
    absent (no statistics — the reader must keep the file)."""
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(fpath).metadata
    names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
    zones: dict[str, Any] = {}
    for col in cols:
        idx = names.get(col)
        if idx is None:
            continue  # e.g. a Hive partition column: not in the file
        lo = hi = None
        have = True
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                if st is not None and st.num_values == 0:
                    continue  # empty row group contributes nothing
                have = False
                break
            if st.num_values == 0:
                continue
            lo = st.min if lo is None or st.min < lo else lo
            hi = st.max if hi is None or st.max > hi else hi
        if not have:
            continue  # no stats -> omit: reader must keep the file
        zones[col] = None if lo is None else [_encode(lo), _encode(hi)]
    return zones


def _write_manifest(path: str, manifest: dict) -> None:
    """Atomic manifest swap: write to a temp file in the same directory
    and ``os.replace`` it over the live name.  A plain ``open('w')``
    truncates in place, so a concurrent :func:`read_pruned` (or a crash
    mid-write) would see a partial manifest — ``load_zonemap`` degrades
    that to a full scan, but pruning would silently vanish until the
    next rebuild.  ``os.replace`` is atomic on POSIX within one
    filesystem, so readers always see the old or the new manifest."""
    final = os.path.join(path, MANIFEST_NAME)
    tmp = final + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, final)


def build_zonemap(path: str, cols: list[str]) -> dict:
    """Scan every data file's footer and write the zone-map manifest.

    Returns the manifest dict: relative file path -> column ->
    ``[min, max]`` (a ``None`` zone means the column is all-NULL in that
    file; a missing column key means no statistics were available).
    """
    manifest = {
        os.path.relpath(fpath, path): _file_zones(fpath, cols)
        for fpath in _data_files(path)
    }
    _write_manifest(path, manifest)
    return manifest


def update_zonemap(path: str, cols: list[str] | None = None) -> dict:
    """Incrementally maintain the manifest: footer-scan ONLY files not
    yet covered, drop entries for deleted files.  O(new files) instead
    of :func:`build_zonemap`'s O(all files) — the right call after each
    streaming micro-batch append.  Columns default to the manifest's
    union (+ any extra ``cols``) so appends keep covering what the
    build covered."""
    manifest = load_zonemap(path) or {}
    want = sorted(
        set(cols or []) | {c for zones in manifest.values() for c in zones}
    )
    current = {os.path.relpath(f, path): f for f in _data_files(path)}
    manifest = {rel: z for rel, z in manifest.items() if rel in current}
    for rel, fpath in current.items():
        if rel not in manifest:
            manifest[rel] = _file_zones(fpath, want)
    _write_manifest(path, manifest)
    return manifest


def load_zonemap(path: str) -> dict | None:
    try:
        with open(os.path.join(path, MANIFEST_NAME)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def _utc_align(bound, stat):
    """Make a datetime bound comparable with a datetime stat when exactly
    one of them is naive.  The engine pins the session timezone to UTC
    (session.py) and Spark writes TIMESTAMP_MICROS with isAdjustedToUTC,
    so parquet stats come back UTC-aware while callers naturally pass
    naive literals (e.g. the panel's pinned '2024-01-05 00:00:00') —
    without alignment every such comparison TypeErrors into keep-the-file
    and pruning silently vanishes."""
    if isinstance(bound, dt.datetime) and isinstance(stat, dt.datetime):
        if bound.tzinfo is None and stat.tzinfo is not None:
            return bound.replace(tzinfo=dt.timezone.utc)
        if bound.tzinfo is not None and stat.tzinfo is None:
            return bound.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return bound


def _zone_allows(zones: dict | None, col: str, lo, hi) -> bool:
    """True unless the file's zone PROVES no row can satisfy the range."""
    if zones is None or col not in zones:
        return True  # unknown file / no stats: must scan
    zone = zones[col]
    if zone is None:
        # all-NULL column: no row can match a RANGE, but a boundless
        # read has no range — dropping the file would lose its rows
        return lo is None and hi is None
    zmin, zmax = _decode(zone[0]), _decode(zone[1])
    lo, hi = _utc_align(lo, zmin), _utc_align(hi, zmax)
    try:
        if lo is not None and zmax < lo:
            return False
        if hi is not None and zmin > hi:
            return False
    except TypeError:
        # bound/stat type mismatch (e.g. date stats vs datetime bound):
        # a plain scan+filter would handle it, so pruning must too —
        # keep the file, let the residual filter decide
        pass
    return True


def prune_files(
    path: str, col: str, lo=None, hi=None
) -> tuple[list[str], int]:
    """Return (files to scan, total files).  A file survives unless its
    manifest zone for ``col`` proves it cannot contain a row in
    ``[lo, hi]`` (either bound may be None for a half-open range)."""
    return prune_files_multi(path, [(col, lo, hi)])


def prune_files_multi(
    path: str, predicates: list[tuple]
) -> tuple[list[str], int]:
    """Conjunctive multi-column pruning: a file survives only if EVERY
    ``(col, lo, hi)`` predicate's zone allows it — the 2-D z-order case
    (x-range AND y-range) in one call."""
    files = _data_files(path)
    manifest = load_zonemap(path) or {}
    keep = []
    for fpath in files:
        zones = manifest.get(os.path.relpath(fpath, path))
        if all(_zone_allows(zones, col, lo, hi) for col, lo, hi in predicates):
            keep.append(fpath)
    return keep, len(files)


def read_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    lo=None,
    hi=None,
) -> DataFrame:
    """Range-read with file-level skipping.  ALWAYS applies the residual
    filter, so the result equals ``read + filter`` regardless of manifest
    staleness; the manifest only shrinks the file list."""
    return read_pruned_multi(spark, path, [(col, lo, hi)])


def read_pruned_multi(
    spark: SparkSession,
    path: str,
    predicates: list[tuple],
) -> DataFrame:
    """Conjunctive multi-range read with file-level skipping — same
    result-equals-full-scan contract as :func:`read_pruned`."""
    keep, _total = prune_files_multi(path, predicates)
    if not keep:
        # empty relation with the dataset's schema (schema-only read)
        return spark.read.parquet(path).limit(0)
    df = spark.read.option("basePath", path).parquet(*keep)
    for col, lo, hi in predicates:
        if lo is not None:
            df = df.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(col) <= F.lit(hi))
    return df
