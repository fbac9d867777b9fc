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

Scope (stated, not implied): two commit modes with different filesystem
requirements.  ``mode="link"`` (default) pins INODES via hardlinks —
POSIX-only, and the strongest isolation (survives even raw deletion of
the live tree).  ``mode="manifest"`` pins a FILE LIST instead — the
object-store-capable form (commit writes only small JSON; the primitives
used are list/stat/read/write-small and, on a destructive swap,
move-into-pool — S3 server-side CopyObject territory, no hardlinks or
populated-tree renames anywhere).  Manifest pins lean on the engine's own
immutability contract: writers never modify a parquet file in place, and
the one file-deleting mutator (``compact_dataset``) moves still-pinned
files into the ``_retained`` pool before deleting
(:func:`preserve_replaced_tree`); deletion OUTSIDE the engine's mutators
breaks a manifest pin — detected and raised at read time
(:func:`verify_snapshot`), never silently wrong.  This container tests
both modes on local paths (``check_local`` still gates scheme-qualified
URIs: the driver-side os.* calls need a mounted view); a real
object-store port swaps those calls for the store's list/stat/copy API —
or uses a full table format (Iceberg/Delta), whose query-side contract —
immutable files + versioned manifests + sidecar indexes per version — is
exactly what is proven here, so the serving plans port unchanged.

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
_FILELIST = "_filelist.json"  # manifest-mode version: rel -> size
_RETAINED = "_retained"  # pool of replaced files still pinned by manifests


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


def commit_snapshot(
    path: str, note: str | None = None, mode: str = "link"
) -> int:
    """Pin the dataset's CURRENT file set as the next snapshot version.

    O(files) metadata work, zero data bytes.  Two modes:

    * ``mode="link"`` (default): each data file is hardlinked into the
      version tree under its live relative path (so the Hive partition
      encoding — and therefore partition pruning — is preserved); the
      filesystem's inode refcount is the garbage collector.  Requires a
      POSIX filesystem with hardlinks.
    * ``mode="manifest"``: the version records a FILE LIST
      (``_filelist.json``: relative path -> size) instead of linking —
      the object-store-capable form (S3/HDFS have no hardlinks; the
      commit writes only small JSON objects).  Pinned reads resolve the
      listed files against the live tree and the ``_retained`` pool;
      the immutability contract carrying the mode is the engine's own:
      writers never modify a parquet file in place, and the one
      file-deleting mutator (``compact_dataset``) moves replaced files
      that manifests still pin into the pool before deleting (see
      :func:`preserve_replaced_tree`).  A file deleted OUTSIDE the
      engine's mutators breaks the pin — detected and raised at read
      time (:func:`verify_snapshot`), never silently wrong.

    Both modes copy the skip-index sidecars so zone/bloom state travels
    with the version.  Crash-safe: the tree is built under
    ``_snapshots/.tmp-*`` and becomes visible only via the final atomic
    rename; a crashed build is reaped on the next commit.
    Single-writer, like every mutator in this layer.
    """
    if mode not in ("link", "manifest"):
        raise ValueError(f"mode must be 'link' or 'manifest', got {mode!r}")
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
    if mode == "manifest":
        filelist = {
            os.path.relpath(f, path): os.path.getsize(f) for f in files
        }
        with open(os.path.join(tmp, _FILELIST), "w") as fh:
            json.dump({"files": filelist}, fh)
    else:
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
        "mode": mode,
        "n_files": len(files),
        "committed_at": time.time(),
    }
    with open(os.path.join(tmp, "_meta.json"), "w") as fh:
        json.dump(meta, fh)
    # hwm BEFORE the rename: a crash between the two leaves a gap (hwm
    # advanced, version dir absent) which is harmless — the reverse
    # order left a window where a committed-then-expired version id
    # could be REUSED for different data, breaking external pins ("train
    # on v5"), the one thing _read_hwm exists to prevent.
    _write_hwm(root, version)
    os.rename(tmp, os.path.join(root, vname))
    return version


def snapshot_meta(path: str, version: int) -> dict:
    vdir = os.path.join(_snap_root(_check_local(path)), f"v{version:08d}")
    with open(os.path.join(vdir, "_meta.json")) as fh:
        return json.load(fh)


def _filelist_of(vdir: str) -> dict | None:
    """The rel->size map of a manifest-mode version dir, or None for a
    hardlink-mode version."""
    try:
        with open(os.path.join(vdir, _FILELIST)) as fh:
            obj = json.load(fh)
    except OSError:
        return None
    files = obj.get("files")
    return files if isinstance(files, dict) else None


def _resolve_manifest_rels(
    path: str, filelist: dict
) -> tuple[list[str], list[str]]:
    """Resolve a manifest version's rels against the live tree first,
    then the ``_retained`` pool; size must match the recorded size (the
    engine's writers never modify a file in place and never reuse a
    name with different content, so path+size identifies the file).
    Raises when any pinned file is gone from both — the immutability
    contract was broken outside the engine's mutators; an error beats a
    silently-different corpus."""
    pool = os.path.join(_snap_root(path), _RETAINED)
    live, pooled, missing = [], [], []
    for rel, size in filelist.items():
        lf = os.path.join(path, rel)
        pf = os.path.join(pool, rel)
        if os.path.isfile(lf) and os.path.getsize(lf) == size:
            live.append(rel)
        elif os.path.isfile(pf) and os.path.getsize(pf) == size:
            pooled.append(rel)
        else:
            missing.append(rel)
    if missing:
        raise ValueError(
            f"manifest snapshot of {path!r} pins {len(missing)} file(s) "
            "present in neither the live tree nor the retained pool "
            f"(first: {missing[0]!r}) — the immutability contract was "
            "broken outside the engine's mutators (raw delete/overwrite?). "
            "Use verify_snapshot() for the full list."
        )
    return live, pooled


def verify_snapshot(path: str, version: int) -> dict:
    """Integrity check of one version without reading data:
    ``{"mode", "n_files", "missing": [...]}`` — empty ``missing`` means
    every pinned file is resolvable.  Hardlink versions verify by
    construction (inodes are pinned); manifest versions stat each listed
    file against live tree + retained pool."""
    path = _check_local(path)
    vdir = os.path.join(_snap_root(path), f"v{version:08d}")
    if not os.path.isdir(vdir):
        raise FileNotFoundError(f"snapshot v{version} not found under {path!r}")
    filelist = _filelist_of(vdir)
    if filelist is None:
        return {
            "mode": "link",
            "n_files": len(_data_files(vdir)),
            "missing": [],
        }
    pool = os.path.join(_snap_root(path), _RETAINED)
    missing = [
        rel
        for rel, size in filelist.items()
        if not (
            (os.path.isfile(os.path.join(path, rel))
             and os.path.getsize(os.path.join(path, rel)) == size)
            or (os.path.isfile(os.path.join(pool, rel))
                and os.path.getsize(os.path.join(pool, rel)) == size)
        )
    ]
    return {"mode": "manifest", "n_files": len(filelist), "missing": missing}


def _read_rels(
    spark: SparkSession,
    path: str,
    version: int,
    rels: list[str],
    merge_schema: bool = False,
) -> DataFrame:
    """Scan the given rels of a version, whichever mode it is.  Hardlink
    versions read straight from the version tree; manifest versions
    resolve each rel to the live tree or the retained pool and union the
    two groups (both preserve the Hive rel structure, so partition
    columns derive identically under each basePath)."""
    from big_data_engineering_financial_analysis_spark.sources.zonemap import _reader

    def _rd():
        return _reader(spark, merge_schema)

    vdir = os.path.join(_snap_root(path), f"v{version:08d}")
    filelist = _filelist_of(vdir)
    if filelist is None:
        files = [os.path.join(vdir, rel) for rel in rels]
        return _rd().option("basePath", vdir).parquet(*files)
    live, pooled = _resolve_manifest_rels(
        path, {rel: filelist[rel] for rel in rels}
    )
    pool = os.path.join(_snap_root(path), _RETAINED)
    parts = []
    if live:
        parts.append(
            _rd().option("basePath", path).parquet(
                *[os.path.join(path, rel) for rel in live]
            )
        )
    if pooled:
        parts.append(
            _rd().option("basePath", pool).parquet(
                *[os.path.join(pool, rel) for rel in pooled]
            )
        )
    out = parts[0]
    for p in parts[1:]:
        # an evolved snapshot can split its columns across the two
        # groups; allowMissingColumns keeps the union total (absent
        # columns fill with NULL, the mergeSchema semantics)
        out = out.unionByName(p, allowMissingColumns=merge_schema)
    return out


def read_snapshot(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Scan a pinned version (default: latest) as a normal parquet
    dataset.  Fully isolated from later overwrites/compactions/expiries
    of OTHER versions: hardlink versions via pinned inodes, manifest
    versions via the file list + retained pool (the engine's writers
    never modify parquet files in place).

    ``merge_schema=True`` for versions pinned across a SCHEMA EVOLUTION
    (``sources/evolution.py``): the pinned file set mixes footer
    schemas, and the merged read serves their union exactly as the live
    read would have at commit time — time travel preserves the
    evolution state, it does not normalize it."""
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
    rels = sorted(_version_files(path, version))
    if not rels:
        raise ValueError(
            f"snapshot v{version} of {path!r} holds zero data files "
            "(committed before the first write) — there is no schema to "
            "serve; read a later version"
        )
    return _read_rels(spark, path, version, rels, merge_schema=merge_schema)


def _version_files(path: str, version: int) -> set[str]:
    vdir = os.path.join(_snap_root(path), f"v{version:08d}")
    if not os.path.isdir(vdir):
        raise FileNotFoundError(
            f"snapshot v{version} not found under {path!r} "
            "(expired versions cannot be diffed)"
        )
    filelist = _filelist_of(vdir)
    if filelist is not None:
        return set(filelist)
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
    merge_schema: bool = False,
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
    if not diff["added"]:
        return read_snapshot(spark, path, v_new, merge_schema=merge_schema).limit(0)
    return _read_rels(
        spark, path, v_new, diff["added"], merge_schema=merge_schema
    )


def _manifest_pinned_rels(path: str) -> dict[str, int]:
    """rel -> size pinned by ANY current manifest-mode version."""
    pinned: dict[str, int] = {}
    for v in snapshot_versions(path):
        fl = _filelist_of(os.path.join(_snap_root(path), f"v{v:08d}"))
        if fl:
            pinned.update(fl)
    return pinned


def preserve_replaced_tree(path: str, old_tree: str) -> int:
    """The manifest-mode half of a destructive swap: move files of
    ``old_tree`` (a replaced live tree, e.g. the compactor's aside copy)
    that manifest snapshots still pin — and that the new live tree no
    longer holds — into the ``_retained`` pool, BEFORE the caller
    deletes ``old_tree``.  Returns the number of files retained.  A
    rename on POSIX; on an object store this is the server-side-copy
    step (S3 CopyObject — no data through the driver).  No manifest
    snapshots, or all pins still live: O(versions) metadata work, zero
    moves.  Hardlink versions need nothing here (their inodes survive
    any deletion)."""
    if not os.path.isdir(_snap_root(path)):
        return 0
    pinned = _manifest_pinned_rels(path)
    if not pinned:
        return 0
    pool = os.path.join(_snap_root(path), _RETAINED)
    moved = 0
    for rel, size in pinned.items():
        dst = os.path.join(pool, rel)
        if os.path.isfile(dst):
            continue  # already retained by an earlier swap
        lf = os.path.join(path, rel)
        if os.path.isfile(lf) and os.path.getsize(lf) == size:
            continue  # still live: nothing to preserve
        src = os.path.join(old_tree, rel)
        if os.path.isfile(src) and os.path.getsize(src) == size:
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.rename(src, dst)
            except OSError:  # cross-device aside dir: degrade to copy
                shutil.copy2(src, dst)
            moved += 1
    return moved


def expire_snapshots(path: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` versions; returns the expired
    version numbers.  Hardlink versions' data bytes are reclaimed by the
    filesystem when the last reference to an inode disappears; after
    dropping, the ``_retained`` pool is garbage-collected down to the
    files the REMAINING manifest versions still pin (explicit-delete GC —
    the object-store analogue of the inode refcount)."""
    if keep_last < 0:
        raise ValueError(f"keep_last must be >= 0, got {keep_last}")
    path = _check_local(path)
    root = _snap_root(path)
    _reap_tmp(root)
    versions = snapshot_versions(path)
    drop = versions[: max(0, len(versions) - keep_last)]
    for v in drop:
        shutil.rmtree(os.path.join(root, f"v{v:08d}"))
    pool = os.path.join(root, _RETAINED)
    if drop and os.path.isdir(pool):
        still = set(_manifest_pinned_rels(path))
        for dirpath, _dirs, files in os.walk(pool, topdown=False):
            for f in files:
                full = os.path.join(dirpath, f)
                if os.path.relpath(full, pool) not in still:
                    os.unlink(full)
            if not os.listdir(dirpath):
                os.rmdir(dirpath)
    return drop
