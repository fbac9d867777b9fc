"""JDBC sink/source builders (SURVEY K3, S5).

The reference writes enriched rows to QuestDB with row-at-a-time psycopg2
INSERTs including a manual NaN->None scrub
(services/stream-processing/app/consumer.py:45-102) — ~1 row per network
round trip.  The engine replaces that with Spark's batched JDBC writer:
Spark nulls need no scrub (NaN never reaches a nullable DOUBLE column from
our operators), batches default to 1000 rows/statement, and parallelism is
the frame's partitioning.

No database exists in the build container; builders are exercised up to
``.option()`` wiring in tests, never ``.save()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def questdb_url(host: str = "localhost", port: int = 8812, db: str = "qdb") -> str:
    """QuestDB speaks the Postgres wire protocol (reference connects via
    psycopg2 on :8812, aggregator_django/settings.py:79-90)."""
    return f"jdbc:postgresql://{host}:{port}/{db}"


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    user: str = "admin",
    password: str = "quest",
    batchsize: int = 1000,
    num_partitions: int | None = None,
):
    """Batched append writer for the enriched table (replaces K3).

    ``numPartitions`` caps concurrent connections; at cluster scale set it
    to what the database tolerates, not the frame's partition count.
    """
    if num_partitions:
        df = df.coalesce(num_partitions)
    return (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("batchsize", str(batchsize))
        .option("driver", "org.postgresql.Driver")
        .mode("append")
    )


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    user: str = "admin",
    password: str = "quest",
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int = 8,
) -> DataFrameReader:
    """Partitioned JDBC scan (S5 serving-side reads, parallelized).

    With a numeric/timestamp ``partition_column`` Spark issues
    ``num_partitions`` range-bounded queries concurrently instead of one
    full-table pull through a single connection.
    """
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", "org.postgresql.Driver")
    )
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return r
