"""dbgen ``.tbl`` loader: the classic pipe-delimited TPC-H dump format
reads into frames identical to the parquet tables, including the
full-width dbgen layout (unused standard columns present) and the
trailing pipe."""

from __future__ import annotations

import os

import pytest

from big_data_engineering_financial_analysis_spark.sources import tbl
from big_data_engineering_financial_analysis_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"

#: filler for the standard dbgen columns this repo's subset omits —
#: pipe-free so the line layout stays valid.
_FILLER = {
    "region": {2: "comment text"},
    "nation": {3: "comment text"},
    "customer": {2: "addr", 4: "11-222-333", 7: "comment"},
    "supplier": {2: "addr", 4: "11-222-333", 6: "comment"},
    "part": {2: "Manufacturer#1", 6: "JUMBO BOX", 8: "comment"},
    "orders": {6: "Clerk#000000001", 7: "0", 8: "comment"},
    "lineitem": {
        11: "1996-02-01", 12: "1996-02-10", 13: "DELIVER IN PERSON",
        14: "TRUCK", 15: "comment",
    },
}


def _dbgen_lines(table: str, df) -> list[str]:
    """Render the parquet frame as full-width dbgen rows (trailing |)."""
    width = tbl._DBGEN_WIDTH[table]
    layout = tbl.TBL_LAYOUT[table]
    lines = []
    for row in df.collect():
        cells = [""] * width
        for name, typ, pos in layout:
            v = row[name]
            if typ == "date":
                cells[pos] = v.strftime("%Y-%m-%d")
            elif isinstance(v, float):
                cells[pos] = repr(v)
            else:
                cells[pos] = str(v)
        for pos, filler in _FILLER[table].items():
            cells[pos] = filler
        lines.append("|".join(cells) + "|")
    return lines


@pytest.mark.parametrize("table", sorted(tbl.TBL_LAYOUT))
def test_tbl_reads_equal_parquet(spark, table, tmp_path):
    expected = load_table(spark, SF_DIR, table)
    p = str(tmp_path / f"{table}.tbl")
    with open(p, "w") as fh:
        fh.write("\n".join(_dbgen_lines(table, expected)) + "\n")
    got = tbl.read_tbl(spark, p, table)
    assert got.schema == expected.schema
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_tbl_to_parquet_bridge(spark, tmp_path):
    src = str(tmp_path / "dumps")
    os.makedirs(src)
    for table in ("region", "nation"):
        df = load_table(spark, SF_DIR, table)
        with open(os.path.join(src, f"{table}.tbl"), "w") as fh:
            fh.write("\n".join(_dbgen_lines(table, df)) + "\n")
    out = str(tmp_path / "pq")
    counts = tbl.tbl_to_parquet(spark, src, out)
    assert counts == {"region": 5, "nation": 25}
    back = load_table(spark, out, "nation")
    orig = load_table(spark, SF_DIR, "nation")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orig.collect()))


def test_unknown_table_rejected(spark):
    with pytest.raises(ValueError, match="unknown TPC-H table"):
        tbl.read_tbl(spark, "/nope", "warehouse")
