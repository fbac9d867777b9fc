from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from big_data_engineering_financial_analysis_spark import get_spark

    spark = get_spark("tests", cpus=int(os.environ["SPARK_GRAFT_CPUS"]))
    yield spark
    spark.stop()


@pytest.fixture(scope="module")
def sf_medium_embeddings(spark):
    from big_data_engineering_financial_analysis_spark.sources.parquet import load_table

    return load_table(spark, SF_MEDIUM, "embeddings")


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with every test table registered as a view,
    mirroring the driver's oracle environment (at sf0.01)."""
    import duckdb

    from big_data_engineering_financial_analysis_spark.sources.parquet import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_MEDIUM}/{t}.parquet'"
        )
    yield con
    con.close()
