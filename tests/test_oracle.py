"""Local replica of the driver's DuckDB-oracle gate.

For every registry query: run the Spark DataFrame and the oracle SQL at
sf0.01, canonicalize (sort columns by name, sort rows, stringify), and
compare row counts + values.  This is deliberately stricter than "close
enough" — both sides round derived doubles identically, so canonical
frames must match cell-for-cell.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from big_data_engineering_financial_analysis_spark.plans.registry import ORACLES, QUERIES

from tests.conftest import SF_MEDIUM


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if pd.isna(v):
            return "<null>"
        if isinstance(v, float):
            # Driver-strict: keep float-vs-int dtype visible (1.0 != 1) and
            # preserve IEEE zero sign (-0.0 != 0.0) so a local pass implies a
            # driver hash match.  float() unwraps np.float64 (numpy 2 repr).
            return repr(float(v))
        return str(v)

    out = df.map(cell)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    if name not in ORACLES:
        # declared oracle-free (approximate/sketch ops): driver applies a
        # rows-only check; here just assert it runs and returns rows
        assert QUERIES[name](spark, SF_MEDIUM).count() > 0
        return
    spark_df = QUERIES[name](spark, SF_MEDIUM).toPandas()
    # sweep per-query persisted intermediates (operators cache sketch
    # frames; the session lives for all 71 queries)
    spark.catalog.clearCache()
    oracle_df = duck.execute(ORACLES[name]).fetchdf()

    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} != oracle {len(oracle_df)}"
    )
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: columns {sorted(spark_df.columns)} != {sorted(oracle_df.columns)}"
    )
    a, b = canonicalize(spark_df), canonicalize(oracle_df)
    mism = (a != b).any(axis=1)
    if mism.any():
        idx = mism[mism].index[:5]
        raise AssertionError(
            f"{name}: {int(mism.sum())}/{len(a)} rows differ.\n"
            f"spark:\n{a.loc[idx]}\noracle:\n{b.loc[idx]}"
        )
