"""JSONL (newline-delimited JSON) corpus source/sink.

JSONL is the interchange format of LLM training-data pipelines — crawls
land as ``.jsonl(.gz)`` files, curation tools exchange them, and most
trainer data loaders stream them — so an engine whose dedup/quality/
packing operators run on a ``documents`` table needs the format on both
edges.  The reference itself has no document pipeline (its wire format
is JSON candle messages over Kafka, covered by ``sources/kafka.py``);
this module is part of the training-data extension surface (SURVEY
§2.12), built entirely on Spark's native JSON datasource:

* **Reads are schema-EXPLICIT, never inferred** (the ``schemas.py``
  convention): schema inference scans the data twice and silently
  widens or drops fields per-batch — on a 100 TB corpus that is both a
  second full scan and a correctness hazard (a shard where every
  ``lang`` happens to be null infers as string *or void* depending on
  Spark version).  Corrupt lines land in ``_corrupt_record`` under
  PERMISSIVE mode instead of killing the job, and are countable via
  :func:`corrupt_line_count` — a real crawl always carries a few.
* **Writes go through the seeded-shuffle sharder**: trainers stream
  shards in file order, so corpus order IS training order; the JSONL
  export therefore reuses :mod:`..operators.export`'s md5 order key
  (one hash shuffle at ``n_shards`` reducers, per-shard sort, no global
  exchange) so a rebuild is byte-identical and engine-independent.
  Compression is a writer option (gzip/zstd) — Spark splits plain
  JSONL by byte ranges but reads one ``.gz`` member per task, which is
  exactly the per-shard parallelism the layout encodes anyway.

Scale notes: both paths inherit the JSON datasource's distributed
scan/write (one task per split/shard, no driver materialization);
pruning pushes into the scan only for the partition directories, not
row groups (JSON has no footers) — at-rest analytics should convert to
parquet via :func:`jsonl_to_parquet`, which is the documented one-pass
bridge into the engine's zone-mapped/bloom-indexed layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_engineering_financial_analysis_spark.operators.export import _shard_of, _shuffle_key

#: documents-table schema plus the PERMISSIVE-mode corrupt-line capture
#: column.  Explicit nullable fields: a missing JSON key is NULL, the
#: same contract parquet reads give.
DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_JSONL_SCHEMA,
) -> DataFrame:
    """Schema-explicit JSONL scan.

    PERMISSIVE mode: a malformed line yields one row with every data
    column NULL and the raw line in ``_corrupt_record`` (when the schema
    declares it) — the crawl-ingest posture, where one mangled record
    must not kill a corpus-scale job.  Callers that want hard failure
    pass a schema without the capture column and add
    ``.option("mode", "FAILFAST")`` themselves.
    """
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """The ``documents``-table view of a JSONL corpus: parsed rows only
    (malformed lines dropped by the datasource's DROPMALFORMED mode) —
    drop-in for every operator that reads ``load_table(..., "documents")``.

    DROPMALFORMED rather than a PERMISSIVE read + corrupt-column filter,
    deliberately: Spark refuses any query whose pruned read schema is
    ONLY the corrupt column ("[QUERY_ONLY_CORRUPT_RECORD_COLUMN]"), and
    a ``.count()`` over a corrupt-filtered frame prunes to exactly that
    — the returned frame must survive arbitrary downstream pruning.  A
    record with missing keys is NOT malformed (its absent fields are
    NULL, parquet-read parity)."""
    schema = T.StructType(
        [f for f in DOCUMENTS_JSONL_SCHEMA.fields if f.name != "_corrupt_record"]
    )
    return (
        spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
    )


def corrupt_line_count(spark: SparkSession, path: str) -> int:
    """Number of malformed lines in a JSONL corpus — the ingest health
    check run before trusting a crawl drop.  One scan, one scalar.

    The aggregate deliberately also touches a DATA column: a query whose
    read schema is only the internal corrupt column is rejected by the
    JSON datasource (see :func:`read_documents_jsonl`), so the count
    rides alongside a ``count(doc_id)`` that keeps a real field in the
    pruned schema.
    """
    df = read_jsonl(spark, path)
    row = df.agg(
        F.count(F.when(F.col("_corrupt_record").isNotNull(), 1)).alias("n"),
        F.count("doc_id").alias("_schema_anchor"),
    ).first()
    return int(row["n"])


def write_corpus_jsonl(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 16,
    seed: int = 0,
    compression: str | None = None,
) -> None:
    """Export a curated corpus as seeded-shuffled JSONL shards — the
    trainer-facing twin of ``operators/export.write_corpus_shards``
    (same order key, same shard assignment, JSONL instead of parquet).

    Layout: ``shard=K/part-*.json[.gz]`` partition directories whose
    in-file line order is the shuffle order (per-shard sort rides the
    single hash shuffle; trainers stream files in order, so no ``pos``
    column is written).  ``compression`` is any Spark JSON writer codec
    (``gzip``, ``zstd``); one compressed member per shard keeps the
    read-side parallelism equal to the shard count.
    """
    key = _shuffle_key(F.col(id_col), seed)
    out = (
        df.withColumn("_key", key)
        .withColumn("shard", _shard_of(F.col("_key"), n_shards))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_key", id_col)
        .drop("_key")
    )
    w = out.write.mode("overwrite").partitionBy("shard")
    if compression is not None:
        w = w.option("compression", compression)
    w.json(path)


def stream_documents_jsonl(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming ingest of a JSONL drop directory — the crawl-landing
    pattern: files appear, micro-batches pick them up, and the frame
    feeds ``streaming/corpus.py``'s gate → dedup chain unchanged (the
    gates are stateless projections; the dedup state is keyed on the
    content hash).  Malformed lines are dropped by the datasource
    (DROPMALFORMED — same contract as the batch documents view).
    ``max_files_per_trigger`` bounds per-batch ingest for replay tests
    and backpressure."""
    schema = T.StructType(
        [f for f in DOCUMENTS_JSONL_SCHEMA.fields if f.name != "_corrupt_record"]
    )
    r = spark.readStream.schema(schema).option("mode", "DROPMALFORMED")
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.json(path)


def jsonl_to_parquet(
    spark: SparkSession,
    jsonl_path: str,
    parquet_path: str,
    schema: T.StructType = DOCUMENTS_JSONL_SCHEMA,
) -> int:
    """One-pass bridge from crawl-format JSONL into the engine's at-rest
    parquet layout (which the zone-map/Bloom/snapshot layers then index).
    Corrupt lines are dropped (count them first via
    :func:`corrupt_line_count` if the drop rate matters).  Returns the
    number of rows written."""
    df = read_documents_jsonl(spark, jsonl_path)
    df.write.mode("overwrite").parquet(parquet_path)
    return spark.read.parquet(parquet_path).count()
