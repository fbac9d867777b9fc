"""Export manifests: content-hash provenance for shard exports.

A training-data release is only reproducible if it can be VERIFIED:
the data recipe (seed, budgets, filters) pins what the corpus should
be, and a content manifest pins what the shipped bytes actually are.
Every exporter in this engine writes shards whose bytes are a pure
function of (data, seed) — the parquet/JSONL shard writers ride the
seeded md5 order key and the WebDataset writer emits canonical tar
headers — so per-shard content hashes are STABLE across rebuilds,
cluster sizes, and engines, and a manifest diff is a real data diff.

Two halves:

* :func:`write_export_manifest` — hash every shard file and write
  ``_export_manifest.json`` next to them.  Hashing is DISTRIBUTED
  (``binaryFile`` scan → ``md5(content)`` in executors, one task per
  shard; only path/hash/size rows — file-count-sized, never data-sized
  — reach the driver).  A driver-side loop reading 100 TB of shards
  through one process is the trap this module exists to avoid.
* :func:`verify_export` — recompute and diff: returns the missing,
  added, and corrupted shard lists.  The read-side trust check a
  trainer (or a transfer job) runs before consuming a release.

``extra`` carries the recipe provenance (seed, n_shards, budgets,
upstream snapshot id) into the manifest verbatim — the engine does not
interpret it, but a release without it is just bytes.

Note on Hadoop LocalFileSystem: Spark-written local files carry
``.crc`` sidecars, so an out-of-band modification fails the verify
SCAN with ChecksumException before the hash compare runs — also
detection, just the fail-loud kind.  Object stores (the production
target) have no sidecars; there the md5 diff is the only detector.

Manifest IO follows the driver-local store contract
(``sources/localfs.check_local``); the hash scan itself is cluster-wide.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_export_manifest.json"


def _shard_hashes(spark: SparkSession, path: str) -> dict[str, dict[str, Any]]:
    """rel path -> {md5, bytes} for every non-metadata file under
    ``path``, hashed in executors (one binaryFile task per shard).

    The path's FileStatusCache entry is refreshed first: Spark caches
    directory listings (sizes included) session-wide, so a re-scan
    after files changed on disk would otherwise read with stale lengths
    and fail — and a VERIFIER of all things must see the disk, not a
    cache."""
    spark.catalog.refreshByPath(path)
    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select(
            F.col("path"),
            F.md5(F.col("content")).alias("md5"),
            F.length(F.col("content")).cast("long").alias("n_bytes"),
        )
    )
    base = "file:" + os.path.abspath(path).rstrip("/") + "/"
    out: dict[str, dict[str, Any]] = {}
    for r in raw.collect():  # file-count-sized: (path, hash, size) rows only
        p = r["path"]
        rel = p[len(base):] if p.startswith(base) else p
        name = os.path.basename(rel)
        if name.startswith(("_", ".")):
            continue  # metadata (the manifest itself, markers, _SUCCESS)
        out[rel] = {"md5": r["md5"], "bytes": int(r["n_bytes"])}
    return out


def write_export_manifest(
    spark: SparkSession, path: str, extra: dict | None = None
) -> dict:
    """Hash every shard under ``path`` and write ``_export_manifest.json``
    (atomic same-directory replace).  Returns the manifest dict:
    ``{"files": {rel: {md5, bytes}}, "n_files", "total_bytes", "extra"}``.
    """
    from big_data_engineering_financial_analysis_spark.sources.localfs import check_local

    local = check_local(path, "write_export_manifest")
    files = _shard_hashes(spark, local)
    manifest = {
        "files": files,
        "n_files": len(files),
        "total_bytes": sum(v["bytes"] for v in files.values()),
        "extra": extra or {},
    }
    final = os.path.join(local, MANIFEST_NAME)
    tmp = final + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, sort_keys=True)
    os.replace(tmp, final)
    return manifest


def read_export_manifest(path: str) -> dict | None:
    """The committed manifest, or None when absent/unparseable."""
    try:
        with open(os.path.join(path, MANIFEST_NAME)) as fh:
            obj = json.load(fh)
    except (OSError, ValueError):
        return None
    return obj if isinstance(obj, dict) and "files" in obj else None


def verify_export(spark: SparkSession, path: str) -> dict:
    """Recompute shard hashes and diff against the committed manifest.

    Returns ``{"ok": bool, "missing": [...], "added": [...],
    "corrupted": [...]}`` — missing = in manifest, not on disk; added =
    on disk, not in manifest; corrupted = present with a different
    md5/size.  Raises ``ValueError`` when no manifest exists (absence
    is not verification success).
    """
    from big_data_engineering_financial_analysis_spark.sources.localfs import check_local

    local = check_local(path, "verify_export")
    manifest = read_export_manifest(local)
    if manifest is None:
        raise ValueError(f"no {MANIFEST_NAME} under {path!r} — nothing to verify")
    want = manifest["files"]
    have = _shard_hashes(spark, local)
    missing = sorted(set(want) - set(have))
    added = sorted(set(have) - set(want))
    corrupted = sorted(
        rel for rel in set(want) & set(have) if want[rel] != have[rel]
    )
    return {
        "ok": not (missing or added or corrupted),
        "missing": missing,
        "added": added,
        "corrupted": corrupted,
    }
