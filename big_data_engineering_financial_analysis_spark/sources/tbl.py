"""TPC-H ``.tbl`` (pipe-delimited) source — classic dbgen dumps.

The relational test tables ship here as parquet, but the standard way
TPC-H-shaped data arrives in the wild is dbgen's ``<table>.tbl``: pipe-
separated, no header, one trailing ``|`` per line, dates as
``yyyy-MM-dd``.  This loader reads those dumps straight into the same
frames `sources/parquet.load_table` produces (this repo's column
subset and types), so every registry query and oracle runs unchanged
on a raw dbgen drop — the usual first step being a one-pass
:func:`tbl_to_parquet` conversion into the engine's indexed at-rest
layout.

Implementation is Spark's CSV datasource with ``sep='|'`` and an
EXPLICIT schema (the ``schemas.py`` convention — inference is a second
full scan and types drift per shard).  dbgen's trailing ``|`` parses
as one empty extra column; the declared schemas simply omit it and the
reader drops it by position.  Scale: CSV scans split by byte ranges,
so parallelism is file-size-bound like any text source; filters do not
push into the scan (no footers) — hence the convert-to-parquet bridge
as the documented serving posture.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: dbgen column order per table, trimmed to this repo's column subset.
#: Each entry is (name, spark type, dbgen position) — positions are
#: 0-based into the full dbgen row, letting the loader place this
#: repo's subset inside the standard 1.0-spec layout.
_STR, _I32, _I64, _DBL, _DATE = "string", "int", "long", "double", "date"

TBL_LAYOUT: dict[str, list[tuple[str, str, int]]] = {
    "region": [("r_regionkey", _I32, 0), ("r_name", _STR, 1)],
    "nation": [
        ("n_nationkey", _I32, 0), ("n_name", _STR, 1), ("n_regionkey", _I32, 2)
    ],
    "customer": [
        ("c_custkey", _I64, 0), ("c_name", _STR, 1), ("c_nationkey", _I32, 3),
        ("c_acctbal", _DBL, 5), ("c_mktsegment", _STR, 6),
    ],
    "supplier": [
        ("s_suppkey", _I64, 0), ("s_name", _STR, 1), ("s_nationkey", _I32, 3),
        ("s_acctbal", _DBL, 5),
    ],
    "part": [
        ("p_partkey", _I64, 0), ("p_name", _STR, 1), ("p_brand", _STR, 3),
        ("p_type", _STR, 4), ("p_size", _I32, 5), ("p_retailprice", _DBL, 7),
    ],
    "orders": [
        ("o_orderkey", _I64, 0), ("o_custkey", _I64, 1),
        ("o_orderstatus", _STR, 2), ("o_totalprice", _DBL, 3),
        ("o_orderdate", _DATE, 4), ("o_orderpriority", _STR, 5),
    ],
    "lineitem": [
        ("l_orderkey", _I64, 0), ("l_partkey", _I64, 1), ("l_suppkey", _I64, 2),
        ("l_linenumber", _I32, 3), ("l_quantity", _DBL, 4),
        ("l_extendedprice", _DBL, 5), ("l_discount", _DBL, 6),
        ("l_tax", _DBL, 7), ("l_returnflag", _STR, 8),
        ("l_linestatus", _STR, 9), ("l_shipdate", _DATE, 10),
    ],
}

#: full dbgen column counts (1.0 spec) — the read schema declares every
#: position as string and the projection casts the subset, so a dump
#: with the standard trailing comment/address columns parses exactly.
_DBGEN_WIDTH = {
    "region": 3, "nation": 4, "customer": 8, "supplier": 7,
    "part": 9, "orders": 9, "lineitem": 16,
}


def read_tbl(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Read one dbgen ``.tbl`` dump into this repo's frame for ``table``.

    ``path`` may be the file itself or a directory of split files
    (``lineitem.tbl.1`` …).  Timestamps: the parquet tables carry
    date-valued TIMESTAMP columns, so ``date`` fields cast through
    ``to_timestamp`` for drop-in parity with ``load_table``.
    """
    layout = TBL_LAYOUT.get(table)
    if layout is None:
        raise ValueError(
            f"unknown TPC-H table {table!r} (supported: {sorted(TBL_LAYOUT)})"
        )
    width = _DBGEN_WIDTH[table]
    raw_schema = T.StructType(
        [T.StructField(f"_c{i}", T.StringType(), True) for i in range(width)]
    )
    raw = (
        spark.read.schema(raw_schema)
        .option("sep", "|")
        .option("header", "false")
        # dbgen writes a trailing '|'; the extra empty trailing field is
        # beyond the declared width and PERMISSIVE mode drops it
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    cols = []
    for name, typ, pos in layout:
        c = F.col(f"_c{pos}")
        if typ == _DATE:
            cols.append(F.to_timestamp(c, "yyyy-MM-dd").alias(name))
        else:
            cols.append(c.cast(typ).alias(name))
    return raw.select(*cols)


def tbl_to_parquet(
    spark: SparkSession, tbl_dir: str, out_dir: str, tables: list[str] | None = None
) -> dict[str, int]:
    """Convert a directory of dbgen dumps (``<table>.tbl``) into the
    engine's parquet table layout (``<table>.parquet``) — the one-pass
    ingest bridge; returns per-table row counts."""
    counts: dict[str, int] = {}
    for t in tables or sorted(TBL_LAYOUT):
        src = os.path.join(tbl_dir, f"{t}.tbl")
        if not os.path.exists(src):
            continue
        df = read_tbl(spark, src, t)
        dst = os.path.join(out_dir, f"{t}.parquet")
        df.write.mode("overwrite").parquet(dst)
        counts[t] = spark.read.parquet(dst).count()
    return counts
