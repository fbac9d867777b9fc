"""WebDataset-style tar shards for multimodal training data.

The de-facto loading format for large-scale multimodal training
(WebDataset / the original ``tarp`` tooling; adopted by OpenCLIP-style
pipelines) is a directory of ``shard-NNNNN.tar`` files where each
sample is a group of adjacently-stored members sharing a key prefix —
here ``<key>.json`` (typed metadata) followed by ``<key>.bin`` (the
opaque payload).  Trainers stream shards sequentially with zero-seek
IO; shard order times in-shard order IS training order.

This module maps the engine's ``ASSET_SCHEMA`` frames onto that format
with the same determinism contract as the text-corpus exporters
(``operators/export.py`` / ``sources/jsonl.py``):

* **Shard assignment and in-shard order are the seeded md5 key** — a
  pure function of (seed, asset_id), so rebuilds are byte-identical
  across cluster sizes, retries, and input layouts.
* **Tar bytes are canonical**: fixed mtime/uid/gid/mode in every
  header, USTAR format, members written json-then-payload in key
  order — two runs of the writer produce identical files, which makes
  shard-level content hashing (and therefore cache/dedup of shards
  themselves) meaningful.
* **One tar per shard, one hash shuffle total**: the writer
  repartitions on the shard id and each task streams its shard(s) to
  disk through ``tarfile`` — payloads never gather on the driver.  The
  reader is ``binaryFile``-scan → Arrow-batched untar (one task per
  tar, the format's native parallelism).

Stdlib ``tarfile`` + Spark built-ins only.  The reference has no media
handling at all (SURVEY §2.12 M-family is engine extension surface);
the payloads themselves stay opaque here — decode/features live in
:mod:`.multimodal` and :mod:`.codecs`.

``out_dir`` follows the engine's driver-local store contract
(``sources/localfs.check_local``) in local mode; on a cluster the same
writer targets any task-visible shared filesystem path.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from big_data_engineering_financial_analysis_spark.schemas import ASSET_SCHEMA

#: zero-padded sample-key width: 12 digits holds 10^12 assets, and fixed
#: width keeps lexicographic member order == numeric key order inside a
#: shard listing.
KEY_WIDTH = 12


def _sample_key(asset_id: int) -> str:
    return f"{asset_id:0{KEY_WIDTH}d}"


def _tar_member(tar: tarfile.TarFile, name: str, data: bytes) -> None:
    """Add one member with canonical (deterministic) header fields."""
    info = tarfile.TarInfo(name=name)
    info.size = len(data)
    info.mtime = 0
    info.uid = 0
    info.gid = 0
    info.uname = ""
    info.gname = ""
    info.mode = 0o644
    tar.addfile(info, io.BytesIO(data))


def write_webdataset(
    assets: DataFrame,
    out_dir: str,
    n_shards: int = 4,
    seed: int = 0,
    id_col: str = "asset_id",
) -> list[str]:
    """Export an ASSET_SCHEMA frame as ``shard-NNNNN.tar`` files.

    One seeded hash shuffle (the export-family sharder): every task
    receives whole shards sorted by (shard, order-key, id) and streams
    each of its shards into one tar — json member first, payload member
    second, samples in shuffle order.  NULL payloads are rejected with
    a clean error (a tar member cannot represent SQL NULL; encode
    absent media upstream as an empty payload plus a meta flag if the
    distinction matters).  Returns the shard file paths.
    """
    from big_data_engineering_financial_analysis_spark.sources.localfs import check_local

    out_dir = check_local(
        out_dir, "write_webdataset",
        why="shard tars are written through local/shared-filesystem IO",
    )
    return _write_tars(assets, out_dir, n_shards, seed, id_col, prefix="shard-")


def _write_tars(
    assets: DataFrame,
    out_dir: str,
    n_shards: int,
    seed: int,
    id_col: str,
    prefix: str,
) -> list[str]:
    """Shared tar-writing kernel of the batch writer and the streaming
    sink: one seeded shard shuffle, whole shards streamed per task as
    ``{prefix}{shard:05d}.tar``.  Returns the paths written under this
    prefix (sorted)."""
    from pyspark.sql import functions as F

    from big_data_engineering_financial_analysis_spark.operators.export import _shard_of, _shuffle_key

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    os.makedirs(out_dir, exist_ok=True)

    key = _shuffle_key(F.col(id_col), seed)
    prepared = (
        assets.withColumn("_key", key)
        .withColumn("_shard", _shard_of(F.col("_key"), n_shards))
        .repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", "_key", id_col)
        .select("_shard", "asset_id", "modality", "media_type", "payload", "meta")
    )

    def write_partition(rows: Iterator) -> None:
        tar: tarfile.TarFile | None = None
        current = None
        try:
            for row in rows:
                shard = row["_shard"]
                if shard != current:
                    if tar is not None:
                        tar.close()
                    current = shard
                    tar = tarfile.open(
                        os.path.join(out_dir, f"{prefix}{shard:05d}.tar"),
                        "w",
                        format=tarfile.USTAR_FORMAT,
                    )
                if row["payload"] is None:
                    raise ValueError(
                        f"NULL payload for asset_id={row['asset_id']} — "
                        "webdataset members cannot represent NULL"
                    )
                k = _sample_key(row["asset_id"])
                meta = {
                    "asset_id": row["asset_id"],
                    "modality": row["modality"],
                    "media_type": row["media_type"],
                    "meta": dict(row["meta"]) if row["meta"] is not None else None,
                }
                _tar_member(
                    tar, f"{k}.json",
                    json.dumps(meta, sort_keys=True).encode("utf-8"),
                )
                _tar_member(tar, f"{k}.bin", bytes(row["payload"]))
        finally:
            if tar is not None:
                tar.close()

    prepared.foreachPartition(write_partition)
    return sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.startswith(prefix) and f.endswith(".tar")
    )


def webdataset_sink(
    out_dir: str,
    n_shards_per_batch: int = 1,
    seed: int = 0,
    id_col: str = "asset_id",
    writer_id: str | None = None,
):
    """Build a ``foreachBatch`` function appending WebDataset shards per
    micro-batch — the streaming half of the multimodal export path
    (asset stream in, ``shard-<epoch>-<k>.tar`` files out).

    Shard naming embeds the epoch id so batches never collide, and the
    standard ``_batches/<id>`` marker protocol (streaming/dataset_sink.py)
    makes foreachBatch redelivery a no-op — combined with the canonical
    tar bytes, a recovered stream produces the exact same files it would
    have produced uninterrupted.  :func:`read_webdataset` consumes the
    accumulated directory unchanged (its glob matches both batch and
    streaming shard names).

    ``writer_id`` scopes markers AND shard names to one (query,
    checkpoint) incarnation — batch ids restart at 0 under a fresh
    checkpoint, so a second query writing the same directory must pass
    its own id or its early batches are skipped as replays (the
    dataset_sink contract)."""
    import os as _os

    from big_data_engineering_financial_analysis_spark.sources.localfs import check_local

    out_dir = check_local(
        out_dir, "webdataset_sink",
        why="shard tars and replay markers use local/shared-filesystem IO",
    )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from big_data_engineering_financial_analysis_spark.streaming.dataset_sink import _marker_name

        marker = _os.path.join(
            out_dir, "_batches", _marker_name(writer_id, epoch_id)
        )
        if _os.path.exists(marker):
            return  # redelivered batch: shards already committed
        prefix = (
            f"shard-{epoch_id:05d}-"
            if writer_id is None
            else f"shard-{writer_id}-{epoch_id:05d}-"
        )
        _write_tars(
            batch_df,
            out_dir,
            n_shards=n_shards_per_batch,
            seed=seed,
            id_col=id_col,
            prefix=prefix,
        )
        _os.makedirs(marker, exist_ok=True)

    return write_batch


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``shard-*.tar`` files back into an ASSET_SCHEMA frame.

    ``binaryFile`` scan (one task per tar — the format's native
    parallelism; shards are sized for memory by construction) feeding an
    Arrow-batched untar.  Samples reassemble from their ``.json`` +
    ``.bin`` member pair; key order inside the tar is preserved into
    row order within each task, though downstream Spark ops are of
    course order-agnostic.
    """
    import pandas as pd

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "shard-*.tar")
        .load(path)
        .select("content")
    )

    def untar(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": [], "modality": [], "media_type": [],
                "payload": [], "meta": [],
            }
            for content in pdf["content"]:
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    pending: dict[str, dict] = {}
                    payloads: dict[str, bytes] = {}
                    for member in tar.getmembers():
                        k, _, kind = member.name.partition(".")
                        data = tar.extractfile(member).read()
                        if kind == "json":
                            pending[k] = json.loads(data)
                        elif kind == "bin":
                            payloads[k] = data
                    for k in sorted(pending):
                        m = pending[k]
                        if k not in payloads:
                            raise ValueError(
                                f"webdataset sample {k!r} has metadata but "
                                "no payload member"
                            )
                        out["asset_id"].append(m["asset_id"])
                        out["modality"].append(m["modality"])
                        out["media_type"].append(m["media_type"])
                        out["payload"].append(payloads[k])
                        out["meta"].append(m["meta"])
            yield pd.DataFrame(out)

    return raw.mapInPandas(untar, schema=ASSET_SCHEMA)
