"""Incremental ATR/Keltner state machine — O(1) per-symbol state.

Streaming twin of :func:`functions.indicators_ext.with_atr_keltner`
over a BAR stream (high/low/close per bucket, e.g. from the streaming
OHLC stage).  Two Wilder/EMA recursions plus the previous close:

    prev_close   for the true-range gap term
    atr          RMA recursion  atr' = atr*(1-1/n) + tr/n   (seeded at
                 the first TR — the engine's ewm(adjust=False) rule)
    kc           EMA(n_ema) of close for the Keltner mid
    n_seen       warm-up gates (ATR NULL before n_atr bars, mid before
                 n_ema)
    last_time_us first-writer-wins late/duplicate policy, as everywhere
                 in streaming/

For in-order input the recursions perform the identical FP operations
in the same order as the batch fold, so outputs are bit-identical —
asserted in ``tests/test_streaming_atr.py``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pandas as pd

N_ATR, N_EMA, MULT = 14, 20, 2.0
A_ATR = 1.0 / N_ATR
A_EMA = 2.0 / (N_EMA + 1.0)

STATE_DDL = (
    "prev_close double, atr double, kc double, n_seen long, last_time_us long"
)

OUT_COLS = ["tr", "atr", "kc_mid", "kc_upper", "kc_lower"]


@dataclass
class AtrState:
    prev_close: float = math.nan
    atr: float = math.nan
    kc: float = math.nan
    n_seen: int = 0
    last_time_us: int = -(2**62)

    def to_tuple(self) -> tuple:
        return (
            float(self.prev_close), float(self.atr), float(self.kc),
            int(self.n_seen), int(self.last_time_us),
        )

    @classmethod
    def from_tuple(cls, t) -> "AtrState":
        return cls(
            prev_close=t[0], atr=t[1], kc=t[2], n_seen=t[3], last_time_us=t[4]
        )


def step(
    state: AtrState, high: float, low: float, close: float, time_us: int
) -> dict | None:
    """Advance one bar; None if late/duplicate (first-writer-wins)."""
    if time_us <= state.last_time_us:
        return None
    state.last_time_us = time_us
    state.n_seen += 1

    if math.isnan(state.prev_close):
        tr = high - low
    else:
        tr = max(high - low, abs(high - state.prev_close), abs(low - state.prev_close))
    state.prev_close = close

    if state.n_seen == 1:
        state.atr = tr
        state.kc = close
    else:
        state.atr = state.atr * (1.0 - A_ATR) + tr * A_ATR
        state.kc = state.kc * (1.0 - A_EMA) + close * A_EMA

    atr = state.atr if state.n_seen >= N_ATR else math.nan
    mid = state.kc if state.n_seen >= N_EMA else math.nan
    return {
        "tr": tr,
        "atr": atr,
        "kc_mid": mid,
        "kc_upper": mid + MULT * atr,
        "kc_lower": mid - MULT * atr,
    }


def process_group(
    state: AtrState,
    pdf: pd.DataFrame,
    time_col: str = "bucket",
) -> pd.DataFrame:
    """Run :func:`step` over one symbol's bars in event-time order;
    stable sort keeps tie-breaking at arrival order (first-writer-wins
    drops the later duplicates deterministically)."""
    pdf = pdf.sort_values(time_col, kind="stable")
    out_rows = []
    for row in pdf.itertuples(index=False):
        d = row._asdict()
        time_us = int(pd.Timestamp(d[time_col]).value // 1000)
        res = step(
            state, float(d["high"]), float(d["low"]), float(d["close"]), time_us
        )
        if res is not None:
            out_rows.append({**d, **res})
    return pd.DataFrame(out_rows)


def atr_stream(
    bars,
    timeout: str = "NoTimeout",
    time_col: str = "bucket",
):
    """Streaming ATR/Keltner via applyInPandasWithState, keyed by
    symbol; input is a bar stream with high/low/close columns."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in bars.schema.fields
    )
    out_schema = fields + ", " + ", ".join(f"{c} double" for c in OUT_COLS)

    def update(key, pdfs, group_state):
        st = (
            AtrState.from_tuple(group_state.get)
            if group_state.exists
            else AtrState()
        )
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            # concat preserves arrival order; process_group does the one
            # stable event-time sort (a pre-sort here would be a
            # redundant second O(n log n) pass per micro-batch)
            pdf = pd.concat(frames)
            out = process_group(st, pdf, time_col)
            if len(out):
                yield out
        group_state.update(st.to_tuple())

    return bars.groupBy("stock_symbol").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
