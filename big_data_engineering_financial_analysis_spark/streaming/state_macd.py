"""Incremental MACD state machine — O(1) per-symbol state.

Streaming twin of :func:`functions.indicators_ext.with_macd`: three EMA
recursions (fast, slow, signal) plus two counters.  For in-order input the
recursion performs the identical floating-point operations in the same
order as the batch HOF fold, so outputs are bit-identical — asserted by
``tests/test_streaming.py``-style parity in ``tests/test_indicators_ext.py``.

State per symbol:

    ema_fast / ema_slow   running EMA values (seeded at the first close)
    sig                   running EMA of the MACD series (seeded at the
                          first non-null MACD, i.e. once slow warms up)
    n_seen                closes so far        (fast/slow warm-up gates)
    n_macd                non-null MACDs so far (signal warm-up gate)
    last_time_us          late-row policy (first-writer-wins, as in
                          streaming/state.py)
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pandas as pd

FAST, SLOW, SIGNAL = 12, 26, 9
A_FAST, A_SLOW, A_SIG = 2.0 / (FAST + 1.0), 2.0 / (SLOW + 1.0), 2.0 / (SIGNAL + 1.0)

STATE_DDL = (
    "ema_fast double, ema_slow double, sig double, "
    "n_seen long, n_macd long, last_time_us long"
)

OUT_COLS = ["ema_12", "ema_26", "macd", "macd_signal", "macd_hist"]


@dataclass
class MacdState:
    ema_fast: float = math.nan
    ema_slow: float = math.nan
    sig: float = math.nan
    n_seen: int = 0
    n_macd: int = 0
    last_time_us: int = -(2**62)

    def to_tuple(self) -> tuple:
        return (
            float(self.ema_fast), float(self.ema_slow), float(self.sig),
            int(self.n_seen), int(self.n_macd), int(self.last_time_us),
        )

    @classmethod
    def from_tuple(cls, t) -> "MacdState":
        return cls(
            ema_fast=t[0], ema_slow=t[1], sig=t[2],
            n_seen=t[3], n_macd=t[4], last_time_us=t[5],
        )


def step(state: MacdState, close: float, time_us: int) -> dict | None:
    """Advance one row; None if late/duplicate (first-writer-wins)."""
    if time_us <= state.last_time_us:
        return None
    state.last_time_us = time_us
    state.n_seen += 1

    # identical recursion to _ema_fold: seed with the first observation
    if state.n_seen == 1:
        state.ema_fast = close
        state.ema_slow = close
    else:
        state.ema_fast = state.ema_fast * (1.0 - A_FAST) + close * A_FAST
        state.ema_slow = state.ema_slow * (1.0 - A_SLOW) + close * A_SLOW

    ema_fast = state.ema_fast if state.n_seen >= FAST else math.nan
    ema_slow = state.ema_slow if state.n_seen >= SLOW else math.nan
    macd = ema_fast - ema_slow  # NaN until slow warms up

    sig = math.nan
    if not math.isnan(macd):
        state.n_macd += 1
        if state.n_macd == 1:
            state.sig = macd
        else:
            state.sig = state.sig * (1.0 - A_SIG) + macd * A_SIG
        if state.n_macd >= SIGNAL:
            sig = state.sig

    return {
        "ema_12": ema_fast,
        "ema_26": ema_slow,
        "macd": macd,
        "macd_signal": sig,
        "macd_hist": macd - sig,
    }


def process_group(
    state: MacdState,
    pdf: pd.DataFrame,
    time_col: str = "local_time",
    close_col: str = "close",
) -> pd.DataFrame:
    """Run :func:`step` over one symbol's rows in event-time order
    (micro-batches arrive unsorted); returns input columns + MACD columns
    with NaN for not-yet-warm values (NULL once back in Spark).  The sort
    is stable so tie-breaking among equal timestamps follows arrival
    order deterministically (first-writer-wins drops the later ones)."""
    pdf = pdf.sort_values(time_col, kind="stable")
    out_rows = []
    for row in pdf.itertuples(index=False):
        d = row._asdict()
        time_us = int(pd.Timestamp(d[time_col]).value // 1000)
        res = step(state, float(d[close_col]), time_us)
        if res is not None:
            out_rows.append({**d, **res})
    return pd.DataFrame(out_rows)


def macd_stream(
    candles,
    timeout: str = "NoTimeout",
    time_col: str = "local_time",
    close_col: str = "close",
):
    """Streaming MACD via applyInPandasWithState, keyed by symbol."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in candles.schema.fields
    )
    out_schema = fields + ", " + ", ".join(f"{c} double" for c in OUT_COLS)

    def update(key, pdfs, group_state):
        st = (
            MacdState.from_tuple(group_state.get)
            if group_state.exists
            else MacdState()
        )
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            # concat preserves arrival order; process_group does the one
            # stable event-time sort (a pre-sort here would be a
            # redundant second O(n log n) pass per micro-batch)
            pdf = pd.concat(frames)
            out = process_group(st, pdf, time_col, close_col)
            if len(out):
                yield out
        group_state.update(st.to_tuple())

    return candles.groupBy("stock_symbol").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
