"""Schema evolution for the plain-parquet dataset layer.

Lakehouse table formats version their schema in a transaction log; a
plain-parquet dataset evolves through the mergeSchema contract instead:
every file carries its own footer schema, a merged read unions them,
and a column absent from an old file reads as NULL.  The reference's
at-rest store (a fixed QuestDB DDL, db/init_questdb.sql) cannot evolve
at all — columns are ALTER-TABLE-or-bust; this module makes the
parquet-native layout evolve safely at 100 TB, where "rewrite the
dataset to add a column" is not an option:

* :func:`dataset_schema` — the merged (union) schema across all files.
* :func:`align_to_dataset` — cast an incoming frame onto the dataset's
  standing column types so every column keeps ONE parquet physical type
  across all files.  This is the load-bearing guard: Spark's
  ``mergeSchema`` read FAILS on int32-vs-int64 footers for the same
  column, so one careless append with a drifted type bricks every
  future merged read of the whole dataset.  Alignment widens losslessly
  (int → the dataset's long, float → its double), fills dataset columns
  the frame lacks with typed NULLs, passes genuinely NEW columns
  through, and refuses lossy narrowing loudly at write time.
* :func:`append_evolved` — align + clustered append
  (:func:`dataset.write_sharded` with ``mode="append"``).
* :func:`read_evolved` — the merged read.

Skip-index correctness across evolution lives in ``zonemap`` /
``bloomskip``: a footer lacking a queried data column means the merged
read fills it with NULL, so the zone manifest records the all-NULL zone
and the Bloom sidecar an empty filter — range and point queries on a
post-evolution column PRUNE every pre-evolution file instead of
scanning 100 TB of history that provably cannot match (while boundless
and IS NULL reads keep them).  Partition keys are exempt (their values
come from the path, not the footer).

Scale: :func:`dataset_schema` is a footer-only distributed read (Spark
merges schemas on executors); alignment is a projection (zero shuffle);
the append inherits ``write_sharded``'s one-shuffle clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_engineering_financial_analysis_spark.sources.dataset import write_sharded

#: Lossless atomic widenings (incoming -> dataset), mirroring Spark's
#: Cast.canUpCast for the types the engine writes: integer ladder up to
#: long, float -> double, and int-or-narrower -> double (exact in a
#: 53-bit mantissa; long -> double is NOT here — it loses precision).
_WIDEN: set[tuple[str, str]] = {
    ("byte", "short"), ("byte", "integer"), ("byte", "long"),
    ("short", "integer"), ("short", "long"),
    ("integer", "long"),
    ("float", "double"),
    ("byte", "float"), ("short", "float"),
    ("byte", "double"), ("short", "double"), ("integer", "double"),
}


def dataset_schema(spark: SparkSession, path: str) -> T.StructType:
    """The dataset's merged (union) schema — what :func:`read_evolved`
    will produce.  Footer-only IO, distributed by Spark's mergeSchema
    schema inference; no row bytes are read."""
    return spark.read.option("mergeSchema", "true").parquet(path).schema


def align_to_dataset(
    df: DataFrame,
    target: T.StructType,
    allow_new_columns: bool = True,
) -> DataFrame:
    """Project ``df`` onto the dataset's standing schema ``target``:

    * overlapping columns are cast to the dataset's exact type —
      identical types pass through, lossless widenings (``_WIDEN``)
      cast up, anything else (narrowing, cross-family, nested-type
      drift) raises ``TypeError`` at plan time rather than writing a
      footer that breaks every future merged read;
    * dataset columns the frame lacks become typed NULL literals (the
      same value a merged read yields for the frame's rows);
    * frame columns the dataset lacks are appended after the dataset's
      columns (the evolution itself) — or rejected when
      ``allow_new_columns=False`` (strict producers).

    Pure projection: zero shuffle, whole-stage-codegen casts.
    """
    have = {f.name: f for f in df.schema.fields}
    target_names = {f.name for f in target.fields}
    cols = []
    for f in target.fields:
        src = have.get(f.name)
        if src is None:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif src.dataType == f.dataType:
            cols.append(F.col(f.name))
        elif (
            src.dataType.typeName(),
            f.dataType.typeName(),
        ) in _WIDEN:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            raise TypeError(
                f"column {f.name!r}: incoming {src.dataType.simpleString()} "
                f"does not losslessly widen to the dataset's "
                f"{f.dataType.simpleString()}; a mixed-type column breaks "
                f"mergeSchema reads permanently — widen the DATASET first "
                f"(compact_dataset after promoting the column) or cast the "
                f"producer explicitly"
            )
    new = [name for name in df.columns if name not in target_names]
    if new and not allow_new_columns:
        raise ValueError(f"new columns not allowed here: {new}")
    return df.select(*cols, *[F.col(n) for n in new])


def append_evolved(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str],
    max_records_per_file: int | None = None,
    allow_new_columns: bool = True,
) -> None:
    """Schema-aligned clustered append: :func:`align_to_dataset` against
    the dataset's merged schema, then ``write_sharded(mode="append")``.
    After this the dataset may be heterogeneous (old files lack the new
    columns) — read it with :func:`read_evolved`, and skip-index
    maintenance (``update_zonemap`` / ``update_bloom_index``) records
    evolution gaps as all-NULL zones / empty filters so the new columns
    prune across the WHOLE history."""
    aligned = align_to_dataset(
        df,
        dataset_schema(df.sparkSession, path),
        allow_new_columns=allow_new_columns,
    )
    write_sharded(
        aligned,
        path,
        partition_cols,
        sort_cols,
        max_records_per_file=max_records_per_file,
        mode="append",
    )


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Merged read of a schema-evolved dataset: the union schema, with
    pre-evolution files contributing NULL for columns they predate."""
    return spark.read.option("mergeSchema", "true").parquet(path)
