"""Property-based checks of the incremental indicator state machine
against the reference pandas recipe (hypothesis-generated series).

Pure-Python (no Spark) so hundreds of random series run in seconds:
``streaming.state.step`` is the same code the streaming pipeline executes
per row, and test_streaming.py already proves the Spark wiring around it.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_engineering_financial_analysis_spark.streaming.state import SymbolState, step

closes = st.lists(
    st.floats(min_value=0.01, max_value=1e6, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=60,
)


def pandas_oracle(series: list[float]) -> pd.DataFrame:
    s = pd.Series(series)
    out = pd.DataFrame({"close": s})
    out["sma_5"] = s.rolling(5).mean()
    out["ema_10"] = s.ewm(span=10, adjust=False, min_periods=10).mean()
    out["delta"] = s.diff()
    out["gain"] = out["delta"].clip(lower=0)
    out["loss"] = -out["delta"].clip(upper=0)
    out["avg_gain_10"] = out["gain"].rolling(10).mean()
    out["avg_loss_10"] = out["loss"].rolling(10).mean()
    out["rs"] = out["avg_gain_10"] / out["avg_loss_10"].replace({0: None})
    out["rsi_10"] = 100 - (100 / (1 + out["rs"]))
    return out


@settings(max_examples=300, deadline=None)
@given(closes)
def test_incremental_step_matches_pandas(series):
    state = SymbolState()
    rows = [step(state, c, i) for i, c in enumerate(series)]
    oracle = pandas_oracle(series)
    for i, row in enumerate(rows):
        for col in ["sma_5", "ema_10", "delta", "gain", "loss", "avg_gain_10", "avg_loss_10", "rs", "rsi_10"]:
            a, b = row[col], oracle[col].iloc[i]
            if math.isnan(a) or (isinstance(b, float) and math.isnan(b)) or pd.isna(b):
                assert math.isnan(a) and (pd.isna(b)), f"{col}@{i}: {a} vs {b}"
            else:
                np.testing.assert_allclose(a, float(b), rtol=1e-9, err_msg=f"{col}@{i}")


@settings(max_examples=100, deadline=None)
@given(closes, st.integers(min_value=0, max_value=50))
def test_late_rows_dropped(series, late_at):
    """Replaying any earlier timestamp mid-stream must be a no-op."""
    state = SymbolState()
    outputs = []
    for i, c in enumerate(series):
        outputs.append(step(state, c, i))
        if i == late_at and i > 0:
            assert step(state, c * 2, i - 1) is None  # late: dropped
            assert step(state, c * 2, i) is None  # duplicate: dropped
    assert all(o is not None for o in outputs)
