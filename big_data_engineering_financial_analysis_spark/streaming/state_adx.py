"""Incremental ADX/DMI state machine — O(1) per-symbol state.

Streaming twin of :func:`functions.indicators_ta.with_adx_dmi` over a
BAR stream (high/low/close per bucket).  State per symbol:

    prev_high/prev_low/prev_close   for ±DM and the true-range gap term
    atr, s_plus, s_minus            three Wilder RMA recursions, each
                                    seeded at its first observation (the
                                    engine's ewm(adjust=False) rule)
    adx, n_dx                       the ADX recursion runs only on
                                    non-null DX values (mirroring the
                                    batch fold over collect_list's
                                    NULL-skipping prefix) with its own
                                    warm-up counter
    n_seen                          ±DI warm-up gate (NULL before n bars)
    last_time_us                    first-writer-wins late/duplicate
                                    policy, as everywhere in streaming/

For in-order input every recursion performs the identical FP operations
in the same order as the batch fold, so outputs are bit-identical —
asserted in ``tests/test_streaming_adx.py``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pandas as pd

N = 14
ALPHA = 1.0 / N
BETA = 1.0 - ALPHA

STATE_DDL = (
    "prev_high double, prev_low double, prev_close double, "
    "atr double, s_plus double, s_minus double, adx double, "
    "n_seen long, n_dx long, last_time_us long"
)

OUT_COLS = ["plus_dm", "minus_dm", "tr", "atr", "plus_di", "minus_di", "dx", "adx"]


@dataclass
class AdxState:
    prev_high: float = math.nan
    prev_low: float = math.nan
    prev_close: float = math.nan
    atr: float = math.nan
    s_plus: float = math.nan
    s_minus: float = math.nan
    adx: float = math.nan
    n_seen: int = 0
    n_dx: int = 0
    last_time_us: int = -(2**62)

    def to_tuple(self) -> tuple:
        return (
            float(self.prev_high), float(self.prev_low), float(self.prev_close),
            float(self.atr), float(self.s_plus), float(self.s_minus),
            float(self.adx), int(self.n_seen), int(self.n_dx),
            int(self.last_time_us),
        )

    @classmethod
    def from_tuple(cls, t) -> "AdxState":
        return cls(
            prev_high=t[0], prev_low=t[1], prev_close=t[2], atr=t[3],
            s_plus=t[4], s_minus=t[5], adx=t[6], n_seen=t[7], n_dx=t[8],
            last_time_us=t[9],
        )


def step(
    state: AdxState, high: float, low: float, close: float, time_us: int
) -> dict | None:
    """Advance one bar; None if late/duplicate (first-writer-wins)."""
    if time_us <= state.last_time_us:
        return None
    state.last_time_us = time_us
    state.n_seen += 1

    if math.isnan(state.prev_close):
        plus_dm, minus_dm = 0.0, 0.0
        tr = high - low
    else:
        up = high - state.prev_high
        dn = state.prev_low - low
        plus_dm = up if (up > dn and up > 0) else 0.0
        minus_dm = dn if (dn > up and dn > 0) else 0.0
        tr = max(high - low, abs(high - state.prev_close), abs(low - state.prev_close))
    state.prev_high, state.prev_low, state.prev_close = high, low, close

    if state.n_seen == 1:
        state.atr, state.s_plus, state.s_minus = tr, plus_dm, minus_dm
    else:
        state.atr = state.atr * BETA + tr * ALPHA
        state.s_plus = state.s_plus * BETA + plus_dm * ALPHA
        state.s_minus = state.s_minus * BETA + minus_dm * ALPHA

    warm = state.n_seen >= N
    atr = state.atr if warm else math.nan
    if warm and atr != 0.0:
        plus_di = (100.0 * state.s_plus) / atr
        minus_di = (100.0 * state.s_minus) / atr
    else:
        plus_di = minus_di = math.nan

    den = plus_di + minus_di
    if not math.isnan(den) and den != 0.0:
        dx = (100.0 * abs(plus_di - minus_di)) / den
    else:
        dx = math.nan

    # the ADX recursion consumes only non-null DX values — exactly the
    # batch fold over collect_list's NULL-skipping prefix
    if not math.isnan(dx):
        state.n_dx += 1
        state.adx = dx if state.n_dx == 1 else state.adx * BETA + dx * ALPHA
    adx = state.adx if state.n_dx >= N else math.nan

    return {
        "plus_dm": plus_dm,
        "minus_dm": minus_dm,
        "tr": tr,
        "atr": atr,
        "plus_di": plus_di,
        "minus_di": minus_di,
        "dx": dx,
        "adx": adx,
    }


def process_group(
    state: AdxState,
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


def adx_stream(
    bars,
    timeout: str = "NoTimeout",
    time_col: str = "bucket",
):
    """Streaming ADX/DMI via applyInPandasWithState, keyed by symbol;
    input is a bar stream with high/low/close columns."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in bars.schema.fields
    )
    out_schema = fields + ", " + ", ".join(f"{c} double" for c in OUT_COLS)

    def update(key, pdfs, group_state):
        st = (
            AdxState.from_tuple(group_state.get)
            if group_state.exists
            else AdxState()
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
