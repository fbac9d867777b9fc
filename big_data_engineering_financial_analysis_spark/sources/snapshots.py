"""Snapshot isolation for plain-parquet datasets — hardlink manifests.

The dataset layer's mutators are destructive: ``write_sharded(mode=
"overwrite")`` replaces the data, and ``compact_dataset`` rename-swaps the
whole directory, with the documented caveat that a reader in the rename
window "gets path-not-found and should retry".  At 100 TB that caveat is a
correctness hole: a 20-minute scan that started before a compaction reads
file names that no longer exist halfway through.  Table formats solve this
with versioned manifests over immutable files (Iceberg snapshots, Delta
log); this module is the minimal filesystem-native form of that idea:

* :func:`commit_snapshot` HARDLINKS every current data file into
  ``<path>._snapshots/v<N>/`` (preserving the Hive partition tree) and
  copies the tiny skip-index sidecars (``_zonemap.json``,
  ``_bloomskip.json``).  Hardlinks cost no data bytes and pin the file
  INODES, so the snapshot stays intact when the live tree is
  overwritten, compacted, or deleted — the filesystem's refcount is the
  garbage collector.
* :func:`read_snapshot` reads a pinned version as an ordinary parquet
  dataset (partition pruning, zone/bloom skipping and all — the sidecars
  travelled with it).  A reader that pins a version is fully isolated
  from every later mutation: this removes the compaction rename-window
  caveat for any reader that cares.
* :func:`expire_snapshots` drops all but the newest ``keep_last``
  versions; data bytes are reclaimed by the filesystem exactly when the
  last snapshot referencing an inode goes away and the live tree no
  longer holds it.

Scope (stated, not implied): paths must be DRIVER-LOCAL (one shared
filesystem with hardlink support — the same single-writer contract as
``compact_dataset`` and the incremental-dedup signature store; fails fast
on scheme-qualified remote paths).  On an object store this module's job
is done by a real table format; the QUERY-side contract proven here —
immutable files + versioned manifests + sidecar indexes per version — is
exactly what those formats provide, so the serving plans port unchanged.

The reference has no snapshot or time-travel notion at all (QuestDB
tables are mutate-in-place, db/init_questdb.sql); this is engine-native
infrastructure a 100 TB corpus store needs for reproducible training-data
cuts ("train on exactly the corpus as of snapshot 7").

Layout — a SIBLING of the dataset directory, never inside it::

    <path>._snapshots/v00000003/<partition dirs>/<hardlinked files>
    <path>._snapshots/v00000003/_meta.json     # version, note, n_files
    <path>._snapshots/v00000003/_zonemap.json  # copied if present

Sibling, not child, is load-bearing twice over: Spark's
``mode="overwrite"`` deletes the whole output path before writing, and
``compact_dataset`` rename-swaps the whole directory — a child tree
would die with either mutation, a sibling survives both with no
interplay code (the hardlinked inodes don't care where the link lives).
The snapshots even survive deletion of the dataset directory itself.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

from big_data_engineering_financial_analysis_spark.sources.zonemap import _data_files

SNAP_DIR = "_snapshots"  # sibling suffix: <path>._snapshots
_VERSION_RE = re.compile(r"^v(\d{8})$")
_SIDECARS = ("_zonemap.json", "_bloomskip.json")


def _check_local(path: str) -> str:
    from big_data_engineering_financial_analysis_spark.sources.localfs import check_local

    return check_local(
        path, "snapshots",
        why="hardlink manifests — on object stores use a table format "
        "(Iceberg/Delta) for this role",
    )


def _snap_root(path: str) -> str:
    # `<path>._snapshots` — same sibling-suffix convention as the
    # compactor's `<path>._pre_compact` aside
    return os.path.abspath(path).rstrip("/") + "." + SNAP_DIR


def snapshot_versions(path: str) -> list[int]:
    """Existing snapshot versions, ascending.  Missing dir -> []."""
    root = _snap_root(_check_local(path))
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = _VERSION_RE.match(name)
        if m and os.path.isdir(os.path.join(root, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def _read_hwm(root: str) -> int:
    """Highest version number EVER committed (not merely still retained).
    Version ids must never be reused — an external pin like "train on v7"
    must resolve to exactly one corpus forever, or to an expired-version
    error; real table formats make the same guarantee."""
    try:
        with open(os.path.join(root, "_hwm")) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return 0


def _write_hwm(root: str, version: int) -> None:
    # ".tmp-" prefix so a crashed write is reaped by _reap_tmp
    tmp = os.path.join(root, f".tmp-hwm-{os.getpid()}")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(root, "_hwm"))


def _reap_tmp(root: str) -> None:
    """A crashed commit leaves only a ``.tmp-*`` build dir (the final
    os.rename is the commit point); any that exists is garbage."""
    if not os.path.isdir(root):
        return
    for name in os.listdir(root):
        if name.startswith(".tmp-"):
            full = os.path.join(root, name)
            if os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
            else:
                try:  # racing cleaner / permissions: a leak is better
                    os.unlink(full)  # than wedging every future commit
                except OSError:
                    pass


def commit_snapshot(path: str, note: str | None = None) -> int:
    """Pin the dataset's CURRENT file set as the next snapshot version.

    O(files) metadata work, zero data bytes: each data file is hardlinked
    into the version tree under its live relative path (so the Hive
    partition encoding — and therefore partition pruning — is preserved),
    and the skip-index sidecars are copied so zone/bloom pruning works
    against the snapshot exactly as against live.  Crash-safe: the tree
    is built under ``_snapshots/.tmp-*`` and becomes visible only via the
    final atomic rename; a crashed build is reaped on the next commit.
    Single-writer, like every mutator in this layer.
    """
    path = _check_local(path)
    root = _snap_root(path)
    os.makedirs(root, exist_ok=True)
    _reap_tmp(root)
    # never reuse a version id, even after full expiry: an external pin
    # ("train on v7") must resolve to one corpus forever or error
    version = max(_read_hwm(root), (snapshot_versions(path) or [0])[-1]) + 1
    vname = f"v{version:08d}"
    tmp = os.path.join(root, f".tmp-{vname}-{os.getpid()}")
    os.makedirs(tmp)  # empty dataset still commits an (empty) version
    files = _data_files(path)
    for fpath in files:
        rel = os.path.relpath(fpath, path)
        dst = os.path.join(tmp, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.link(fpath, dst)
        except OSError:  # filesystem without hardlinks: degrade to copy
            shutil.copy2(fpath, dst)
    # sidecars live at the root AND (for the partition-sharded Bloom
    # manifest) inside each partition directory holding data files —
    # copy both layers so pruning against the snapshot sees exactly the
    # live index state at commit time
    sidecar_dirs = {""} | {
        os.path.dirname(os.path.relpath(f, path)) for f in files
    }
    for d in sidecar_dirs:
        for sidecar in _SIDECARS:
            src = os.path.join(path, d, sidecar)
            if os.path.isfile(src):
                dst_dir = os.path.join(tmp, d) if d else tmp
                os.makedirs(dst_dir, exist_ok=True)
                shutil.copy2(src, os.path.join(dst_dir, sidecar))
    meta = {
        "version": version,
        "note": note,
        "n_files": len(files),
        "committed_at": time.time(),
    }
    with open(os.path.join(tmp, "_meta.json"), "w") as fh:
        json.dump(meta, fh)
    os.rename(tmp, os.path.join(root, vname))
    _write_hwm(root, version)
    return version


def snapshot_meta(path: str, version: int) -> dict:
    vdir = os.path.join(_snap_root(_check_local(path)), f"v{version:08d}")
    with open(os.path.join(vdir, "_meta.json")) as fh:
        return json.load(fh)


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Scan a pinned version (default: latest) as a normal parquet
    dataset.  Fully isolated from later overwrites/compactions/expiries
    of OTHER versions — the hardlinked inodes are immutable once
    committed (the engine's writers never modify parquet files in
    place)."""
    path = _check_local(path)
    versions = snapshot_versions(path)
    if not versions:
        raise FileNotFoundError(f"no snapshots under {path!r}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(
            f"snapshot v{version} not found under {path!r} "
            f"(have {versions}; expired versions cannot be read)"
        )
    vdir = os.path.join(_snap_root(path), f"v{version:08d}")
    if not _data_files(vdir):
        raise ValueError(
            f"snapshot v{version} of {path!r} holds zero data files "
            "(committed before the first write) — there is no schema to "
            "serve; read a later version"
        )
    return spark.read.option("basePath", vdir).parquet(vdir)


def _version_files(path: str, version: int) -> set[str]:
    vdir = os.path.join(_snap_root(path), f"v{version:08d}")
    if not os.path.isdir(vdir):
        raise FileNotFoundError(
            f"snapshot v{version} not found under {path!r} "
            "(expired versions cannot be diffed)"
        )
    return {os.path.relpath(f, vdir) for f in _data_files(vdir)}


def snapshot_file_diff(path: str, v_old: int, v_new: int) -> dict:
    """File-level changelog between two pinned versions:
    ``{"added": [...], "removed": [...]}`` relative paths.  Pure manifest
    arithmetic — no data IO.  The engine's writers never modify a parquet
    file in place, so a file present in both versions is byte-identical
    in both."""
    path = _check_local(path)
    old, new = _version_files(path, v_old), _version_files(path, v_new)
    return {"added": sorted(new - old), "removed": sorted(old - new)}


def read_snapshot_increment(
    spark: SparkSession,
    path: str,
    v_old: int,
    v_new: int,
    strict: bool = True,
) -> DataFrame:
    """Rows ADDED between two cuts, reading ONLY the added files — the
    incremental-consumer primitive ("process what's new since my last
    cut") a training pipeline needs to avoid reprocessing the corpus.

    Exactness contract: on an append-only history (the `dataset_sink`
    path between compactions) the added files hold exactly the new rows.
    A compaction between the cuts rewrites files (every row moves to a
    new file), so the file diff no longer means row addition; with
    ``strict=True`` (default) that is detected via removed files and
    raised, rather than silently re-emitting the whole corpus as "new".
    Pass ``strict=False`` to consume the rewritten files anyway (caller
    dedups downstream).  Cost: scan of the added files only — the
    increment's size, never the corpus's."""
    if v_old > v_new:
        raise ValueError(
            f"read_snapshot_increment: v_old={v_old} > v_new={v_new} — "
            "a reversed range would present the OLD files as 'added'"
        )
    path = _check_local(path)
    diff = snapshot_file_diff(path, v_old, v_new)
    if strict and diff["removed"]:
        raise ValueError(
            f"snapshot range v{v_old}..v{v_new} spans a file rewrite "
            f"({len(diff['removed'])} files removed — compaction or "
            "overwrite); the file diff no longer equals the row "
            "increment. Re-baseline from the newer cut, or pass "
            "strict=False to consume rewritten files with downstream dedup."
        )
    vdir = os.path.join(_snap_root(path), f"v{v_new:08d}")
    if not diff["added"]:
        return read_snapshot(spark, path, v_new).limit(0)
    files = [os.path.join(vdir, rel) for rel in diff["added"]]
    return spark.read.option("basePath", vdir).parquet(*files)


def expire_snapshots(path: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` versions; returns the expired
    version numbers.  Data bytes are reclaimed by the filesystem when the
    last reference to an inode disappears (remaining snapshots and the
    live tree keep theirs)."""
    if keep_last < 0:
        raise ValueError(f"keep_last must be >= 0, got {keep_last}")
    path = _check_local(path)
    _reap_tmp(_snap_root(path))
    versions = snapshot_versions(path)
    drop = versions[: max(0, len(versions) - keep_last)]
    for v in drop:
        shutil.rmtree(os.path.join(_snap_root(path), f"v{v:08d}"))
    return drop
