"""Incremental Heikin-Ashi state machine — O(1) per-symbol state.

Streaming twin of :func:`functions.indicators_ta.with_heikin_ashi` over
a BAR stream.  State per symbol is just the previous bar's smoothed
pair plus the late-data watermark:

    ha_open_prev / ha_close_prev   the recursion
                                   ha_open' = (ha_open + ha_close) / 2
                                   (first bar seeds (open + close) / 2)
    last_time_us                   first-writer-wins late/duplicate
                                   policy, as everywhere in streaming/

The step arithmetic is the exact ``(acc + x) / 2.0`` of the batch fold
(NOT ``0.5*acc + 0.5*x``, which can differ by an ulp), so outputs are
bit-identical for in-order input — asserted in
``tests/test_streaming_ha.py``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pandas as pd

STATE_DDL = "ha_open_prev double, ha_close_prev double, last_time_us long"

OUT_COLS = ["ha_close", "ha_open", "ha_high", "ha_low"]


@dataclass
class HaState:
    ha_open_prev: float = math.nan
    ha_close_prev: float = math.nan
    last_time_us: int = -(2**62)

    def to_tuple(self) -> tuple:
        return (
            float(self.ha_open_prev),
            float(self.ha_close_prev),
            int(self.last_time_us),
        )

    @classmethod
    def from_tuple(cls, t) -> "HaState":
        return cls(ha_open_prev=t[0], ha_close_prev=t[1], last_time_us=t[2])


def step(
    state: HaState,
    open_: float,
    high: float,
    low: float,
    close: float,
    time_us: int,
) -> dict | None:
    """Advance one bar; None if late/duplicate (first-writer-wins)."""
    if time_us <= state.last_time_us:
        return None
    state.last_time_us = time_us

    ha_close = (open_ + high + low + close) / 4.0
    if math.isnan(state.ha_open_prev):
        ha_open = (open_ + close) / 2.0
    else:
        ha_open = (state.ha_open_prev + state.ha_close_prev) / 2.0
    state.ha_open_prev, state.ha_close_prev = ha_open, ha_close

    return {
        "ha_close": ha_close,
        "ha_open": ha_open,
        "ha_high": max(high, ha_open, ha_close),
        "ha_low": min(low, ha_open, ha_close),
    }


def process_group(
    state: HaState,
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
            state,
            float(d["open"]), float(d["high"]), float(d["low"]),
            float(d["close"]), time_us,
        )
        if res is not None:
            out_rows.append({**d, **res})
    return pd.DataFrame(out_rows)


def ha_stream(
    bars,
    timeout: str = "NoTimeout",
    time_col: str = "bucket",
):
    """Streaming Heikin-Ashi via applyInPandasWithState, keyed by
    symbol; input is a bar stream with open/high/low/close columns."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in bars.schema.fields
    )
    out_schema = fields + ", " + ", ".join(f"{c} double" for c in OUT_COLS)

    def update(key, pdfs, group_state):
        st = (
            HaState.from_tuple(group_state.get)
            if group_state.exists
            else HaState()
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
