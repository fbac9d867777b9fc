"""Streaming sequence packing: the stateful twin of
``operators/packing.pack_chunks``.

Batch packing lays documents head-to-tail per shard and cuts fixed
token windows; the streaming version must CONTINUE each shard's virtual
token stream across micro-batches.  The only state that requires is the
stream position where the next document begins — one long per shard —
kept in ``applyInPandasWithState`` (checkpointable, restart-safe).

Ordering contract: within a micro-batch a shard's documents are packed
in ``id`` order (same as batch); across micro-batches the order is
arrival order.  A feed whose ids are monotone per shard (any log/ingest
feed) therefore produces EXACTLY the batch packing of the concatenated
input — asserted against ``pack_chunks`` in
tests/test_streaming_packing.py.  Chunk ids keep counting across
batches (chunk ``pos // chunk_tokens`` onward), so each shard's final
partial chunk is completed by the next batch's first document — no
padding is ever emitted mid-stream.

Scale: state is 8 bytes per shard; parallelism is the shard count, the
same unit the batch window uses.  The per-group Python loop touches
only (id, n_tokens) pairs — token counting stays in JVM expressions
upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from big_data_engineering_financial_analysis_spark.functions.hashing import tokens
from big_data_engineering_financial_analysis_spark.operators.packing import DEFAULT_CHUNK_TOKENS

STATE_DDL = "next_pos long"
OUT_DDL = "shard string, chunk_id long, doc_id long, seg_start long, seg_len long"


def pack_stream(
    docs: DataFrame,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = DEFAULT_CHUNK_TOKENS,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Chunk assignments for a document stream, continuing each shard's
    token stream across micro-batches (see module docstring)."""
    b = int(chunk_tokens)
    out_schema = StructType.fromDDL(OUT_DDL)

    nt = (
        F.col(n_tokens_col).cast("long")
        if n_tokens_col is not None
        else F.size(tokens(F.col(text_col))).cast("long")
    )
    slim = docs.select(
        F.col(shard_col).alias("shard"), F.col(id_col), nt.alias("n_tokens")
    )

    def update(key, pdfs, state):
        import pandas as pd

        pos = state.get[0] if state.exists else 0
        rows = []
        # A shard whose micro-batch exceeds the Arrow batch size
        # (spark.sql.execution.arrow.maxRecordsPerBatch, default 10k rows)
        # arrives as MULTIPLE pandas chunks; sorting each chunk alone would
        # only be sorted within chunks and silently break the "packed in id
        # order, same as batch" contract.  The frame is tiny (2 columns of
        # longs), so concatenate everything first and sort once.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values("doc_id", kind="stable")
            for did, n in zip(pdf["doc_id"], pdf["n_tokens"]):
                n = int(n)
                if n <= 0:
                    continue
                start, end = pos, pos + n
                for chunk in range(start // b, (end - 1) // b + 1):
                    seg_start = max(chunk * b - start, 0)
                    seg_end = min((chunk + 1) * b, end) - start
                    rows.append(
                        (key[0], chunk, int(did), seg_start, seg_end - seg_start)
                    )
                pos = end
        state.update((pos,))
        if rows:
            yield pd.DataFrame(
                rows, columns=["shard", "chunk_id", "doc_id", "seg_start", "seg_len"]
            )

    return slim.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
