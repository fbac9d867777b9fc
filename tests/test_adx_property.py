"""Property-based checks of the incremental ADX/DMI state machine
against a pandas Wilder model (hypothesis-generated OHLC series).

Pure-Python (no Spark): ``streaming.state_adx.step`` is the same code
the streaming pipeline executes per bar, and test_streaming_adx.py
already proves the Spark wiring (and exact batch-fold parity) around it.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_engineering_financial_analysis_spark.streaming.state_adx import (
    N,
    AdxState,
    step,
)

# (mid, up-wiggle, down-wiggle) triples keep high >= close/open >= low
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


def pandas_oracle(ohlc) -> pd.DataFrame:
    pdf = pd.DataFrame(ohlc, columns=["open", "high", "low", "close"])
    h, l, c = pdf.high, pdf.low, pdf.close
    ph, pl, pc = h.shift(1), l.shift(1), c.shift(1)
    up, dn = h - ph, pl - l
    plus_dm = pd.Series(np.where((up > dn) & (up > 0), up, 0.0))
    minus_dm = pd.Series(np.where((dn > up) & (dn > 0), dn, 0.0))
    tr = pd.concat([h - l, (h - pc).abs(), (l - pc).abs()], axis=1).max(axis=1)

    def rma(s):
        m = s.ewm(alpha=1.0 / N, adjust=False, min_periods=N).mean()
        return m

    atr, sp, sm = rma(tr), rma(plus_dm), rma(minus_dm)
    plus_di = (100.0 * sp) / atr.where(atr != 0.0)
    minus_di = (100.0 * sm) / atr.where(atr != 0.0)
    den = (plus_di + minus_di).where(plus_di + minus_di != 0.0)
    dx = (100.0 * (plus_di - minus_di).abs()) / den
    adx = dx.ewm(alpha=1.0 / N, adjust=False, min_periods=N, ignore_na=True).mean()
    return pd.DataFrame(
        {"tr": tr, "atr": atr, "plus_di": plus_di, "minus_di": minus_di,
         "dx": dx, "adx": adx}
    )


@settings(max_examples=200, deadline=None)
@given(bars)
def test_incremental_adx_matches_pandas(series):
    ohlc = _ohlc(series)
    state = AdxState()
    rows = [
        step(state, h, l, c, i) for i, (o, h, l, c) in enumerate(ohlc)
    ]
    oracle = pandas_oracle(ohlc)
    for i, row in enumerate(rows):
        for col in ["tr", "atr", "plus_di", "minus_di", "dx", "adx"]:
            a, b = row[col], oracle[col].iloc[i]
            if math.isnan(a) or pd.isna(b):
                assert math.isnan(a) and pd.isna(b), f"{col}@{i}: {a} vs {b}"
            else:
                np.testing.assert_allclose(a, float(b), rtol=1e-9, err_msg=f"{col}@{i}")


@settings(max_examples=200, deadline=None)
@given(bars)
def test_di_and_adx_bounded(series):
    """0 <= DI, DX, ADX <= 100 whenever defined (DMs partition TR)."""
    state = AdxState()
    for i, (o, h, l, c) in enumerate(_ohlc(series)):
        row = step(state, h, l, c, i)
        for col in ["plus_di", "minus_di", "dx", "adx"]:
            v = row[col]
            if not math.isnan(v):
                assert -1e-9 <= v <= 100.0 + 1e-9, (col, i, v)


@settings(max_examples=100, deadline=None)
@given(bars, st.integers(min_value=1, max_value=50))
def test_late_bars_dropped(series, late_at):
    state = AdxState()
    outputs = []
    for i, (o, h, l, c) in enumerate(_ohlc(series)):
        outputs.append(step(state, h, l, c, i))
        if i == late_at:
            assert step(state, h * 2, l, c, i - 1) is None
            assert step(state, h * 2, l, c, i) is None
    assert all(o is not None for o in outputs)
