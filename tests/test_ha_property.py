"""Property-based checks of the incremental Heikin-Ashi state machine
(hypothesis-generated OHLC series).  Pure-Python — the Spark wiring and
exact batch-fold parity live in test_streaming_ha.py."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_engineering_financial_analysis_spark.streaming.state_ha import (
    HaState,
    step,
)

bars = st.lists(
    st.tuples(
        st.floats(min_value=1.0, max_value=1e5, allow_nan=False, allow_infinity=False),
        st.floats(min_value=0.0, max_value=50.0, allow_nan=False, allow_infinity=False),
        st.floats(min_value=0.0, max_value=50.0, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=60,
)


def _ohlc(series):
    return [(m, m + u, m - d, m) for m, u, d in series]


@settings(max_examples=200, deadline=None)
@given(bars)
def test_recursion_matches_reference_loop(series):
    ohlc = _ohlc(series)
    st_ = HaState()
    got = [step(st_, o, h, l, c, i) for i, (o, h, l, c) in enumerate(ohlc)]
    ha_close = [(o + h + l + c) / 4.0 for o, h, l, c in ohlc]
    ha_open = [(ohlc[0][0] + ohlc[0][3]) / 2.0]
    for i in range(1, len(ohlc)):
        ha_open.append((ha_open[i - 1] + ha_close[i - 1]) / 2.0)
    for i, row in enumerate(got):
        assert row["ha_close"] == ha_close[i]  # exact: same FP op order
        assert row["ha_open"] == ha_open[i]


@settings(max_examples=200, deadline=None)
@given(bars)
def test_ha_candle_invariants(series):
    """ha_low <= {ha_open, ha_close} <= ha_high, and the smoothed range
    always contains the smoothed body — by construction of max/min."""
    st_ = HaState()
    for i, (o, h, l, c) in enumerate(_ohlc(series)):
        row = step(st_, o, h, l, c, i)
        assert row["ha_low"] <= row["ha_open"] <= row["ha_high"]
        assert row["ha_low"] <= row["ha_close"] <= row["ha_high"]
        assert not math.isnan(row["ha_open"])


@settings(max_examples=100, deadline=None)
@given(bars, st.integers(min_value=1, max_value=50))
def test_late_bars_dropped(series, late_at):
    st_ = HaState()
    outputs = []
    for i, (o, h, l, c) in enumerate(_ohlc(series)):
        outputs.append(step(st_, o, h, l, c, i))
        if i == late_at:
            assert step(st_, o * 2, h, l, c, i - 1) is None
            assert step(st_, o * 2, h, l, c, i) is None
    assert all(x is not None for x in outputs)
