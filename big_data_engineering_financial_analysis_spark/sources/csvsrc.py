"""Checked CSV ingest — the delimited sibling of ``sources/jsonl.py``.

Training-data drops arrive as CSV as often as JSONL (label sheets,
vendor exports, metric dumps).  Spark's CSV datasource does the heavy
lifting (distributed split-parallel parsing, PERMISSIVE/DROPMALFORMED
modes, pushdown-friendly column pruning); this module pins the engine's
ingest contract on top, mirroring the JSONL one exactly:

* **schema-explicit reads** — inference double-scans the data and
  guesses types from a sample, both wrong at 100 TB; every read here
  takes a ``StructType``;
* **corrupt-line capture** — PERMISSIVE mode lands malformed rows in
  ``_corrupt_record`` for the health count instead of failing the job
  or silently dropping (a real vendor export always carries a few);
* **a clean serving view** — DROPMALFORMED without the corrupt column,
  so downstream operators see only well-formed rows;
* **a one-pass parquet bridge** into the indexed at-rest layout
  (``write_sharded`` + sidecars happen downstream, same as JSONL).

The reference ingests only Kafka JSON and yfinance frames; CSV is
engine extension surface (SURVEY §2.12 E-family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the corrupt-capture column name shared with the JSONL contract
CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in [f.name for f in schema.fields]:
        return schema
    return T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def read_csv_checked(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """PERMISSIVE read with corrupt-line capture: well-formed rows parse
    into the explicit ``schema``, malformed ones carry NULL columns and
    the raw line in ``_corrupt_record``.  Feed the result to
    :func:`corrupt_csv_count` for the ingest health number."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_csv_clean(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """The serving view: DROPMALFORMED at the datasource (malformed rows
    never materialize), schema WITHOUT the corrupt column — same
    split of duties as ``jsonl.read_documents_jsonl`` (Spark refuses a
    query over only the internal corrupt column, so the clean view and
    the health count are separate reads by design)."""
    clean = T.StructType(
        [f for f in schema.fields if f.name != CORRUPT_COL]
    )
    return (
        spark.read.schema(clean)
        .option("header", header)
        .option("sep", sep)
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )


def corrupt_csv_count(checked: DataFrame) -> int:
    """Ingest health: how many malformed lines the PERMISSIVE read
    captured.  One aggregate that deliberately also counts a DATA column
    — the datasource rejects a query whose pruned read schema is only
    the internal corrupt column (the jsonl.corrupt_line_count rule), and
    ``count(lit(1))`` references no data column at all."""
    anchor = next((c for c in checked.columns if c != CORRUPT_COL), None)
    if anchor is None:
        # constructible via read_csv_checked with an empty user schema —
        # fail with the contract, not a bare StopIteration (advice r9)
        raise ValueError(
            "schema must contain at least one data column besides "
            f"{CORRUPT_COL!r}"
        )
    row = checked.agg(
        F.count(F.when(F.col(CORRUPT_COL).isNotNull(), 1)).alias("bad"),
        F.count(anchor).alias("_schema_anchor"),
    ).first()
    return int(row["bad"])


def csv_to_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    schema: T.StructType,
    partition_cols: list[str],
    sort_cols: list[str],
    header: bool = True,
    sep: str = ",",
) -> None:
    """One-pass bridge: clean CSV read → the clustered at-rest layout
    (``dataset.write_sharded``) — the standard ingest step before the
    skip-index build."""
    from big_data_engineering_financial_analysis_spark.sources.dataset import write_sharded

    write_sharded(
        read_csv_clean(spark, src, schema, header=header, sep=sep),
        dest,
        partition_cols,
        sort_cols,
    )
