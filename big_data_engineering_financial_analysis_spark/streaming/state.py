"""Incremental indicator state machine.

The reference recomputes every indicator over the FULL accumulated history
on every micro-batch (services/stream-processing/app/consumer.py:184-192:
``pd.concat`` into an unbounded ``global_data``, global re-sort, per-symbol
re-apply) — O(total²) work over a run and guaranteed driver OOM.  This
module keeps O(1) state per symbol:

    closes   last 4 closes          (SMA-5 needs 5 incl. current)
    gains    last 9 gains           (avg_gain_10 needs 10 incl. current)
    losses   last 9 losses
    ema      running EMA value
    n_seen   observations so far    (warm-up gating)
    n_delta  non-null deltas so far
    last_close, last_time_us        (delta + late-row policy)

For rows arriving in event-time order per key, the incremental recursion
performs the *same floating-point operations in the same order* as the
batch window kernel (functions/indicators.py) — outputs are bit-identical,
which tests/test_streaming.py asserts.

Late-data policy: the reference has no watermark — a late row for an
already-seen (symbol, time) is dropped by the ``already_sent`` set, and a
late row for an unseen time silently corrupts the recomputation
(consumer.py:199-205).  Here lateness is explicit: rows at or before the
key's ``last_time`` are dropped (first-writer-wins, matching the
reference's observable output), and the bound is checkpointable state.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pandas as pd

from big_data_engineering_financial_analysis_spark.functions.indicators import (
    BUY,
    EMA_SPAN,
    HOLD,
    RSI_WINDOW,
    SELL,
    SMA_WINDOW,
)

ALPHA = 2.0 / (EMA_SPAN + 1.0)
BETA = 1.0 - ALPHA


@dataclass
class SymbolState:
    closes: list = field(default_factory=list)  # last SMA_WINDOW-1
    gains: list = field(default_factory=list)  # last RSI_WINDOW-1
    losses: list = field(default_factory=list)
    ema: float = math.nan
    n_seen: int = 0
    n_delta: int = 0
    last_close: float = math.nan
    last_time_us: int = -(2**62)

    def to_tuple(self) -> tuple:
        return (
            list(self.closes),
            list(self.gains),
            list(self.losses),
            float(self.ema),
            int(self.n_seen),
            int(self.n_delta),
            float(self.last_close),
            int(self.last_time_us),
        )

    @classmethod
    def from_tuple(cls, t) -> "SymbolState":
        return cls(
            closes=list(t[0]),
            gains=list(t[1]),
            losses=list(t[2]),
            ema=t[3],
            n_seen=t[4],
            n_delta=t[5],
            last_close=t[6],
            last_time_us=t[7],
        )


#: Spark DDL for the state tuple (applyInPandasWithState stateStructType).
STATE_DDL = (
    "closes array<double>, gains array<double>, losses array<double>, "
    "ema double, n_seen long, n_delta long, last_close double, last_time_us long"
)

#: Output columns appended to (stock_symbol, local_time, close).
OUT_COLS = [
    "sma_5", "ema_10", "delta", "gain", "loss",
    "avg_gain_10", "avg_loss_10", "rs", "rsi_10", "signal",
]


def enriched_ddl_suffix() -> str:
    """DDL fragment for the indicator output columns — the single source
    the applyInPandas/applyInPandasWithState schemas derive from."""
    return ", ".join(
        f"{c} string" if c == "signal" else f"{c} double" for c in OUT_COLS
    )


def step(state: SymbolState, close: float, time_us: int) -> dict | None:
    """Advance one row; return the enriched output row or None if late.

    Every arithmetic expression mirrors functions/indicators.py so the
    incremental path is bit-identical to the batch window kernel for
    in-order input.
    """
    if time_us <= state.last_time_us:
        return None  # late or duplicate: first-writer-wins

    state.n_seen += 1

    # SMA-5: mean of the full window, summed in event order (same order as
    # the batch window aggregate) — gated on a full window.
    window = state.closes + [close]
    sma = sum(window) / SMA_WINDOW if len(window) >= SMA_WINDOW else math.nan

    # EMA: seeded with the first close, e = e*beta + x*alpha.
    state.ema = close if state.n_seen == 1 else state.ema * BETA + close * ALPHA
    ema_out = state.ema if state.n_seen >= EMA_SPAN else math.nan

    # delta / gain / loss (NaN-propagating clip)
    if state.n_seen == 1:
        delta = gain = loss = math.nan
    else:
        delta = close - state.last_close
        # "+ 0.0" folds IEEE -0.0 to +0.0, matching the batch paths/oracle.
        # NaN clip parity with the batch kernel's greatest/least: Spark
        # treats NaN as LARGER than any numeric, so greatest(NaN, 0) is
        # NaN (max(delta, 0.0) with delta first reproduces it) while
        # least(NaN, 0) is 0.0 — which Python's min() gets wrong
        # (min(nan, 0.0) -> nan), hence the explicit comparison.
        gain = max(delta, 0.0) + 0.0
        loss = (-delta if delta < 0.0 else 0.0) + 0.0
        state.n_delta += 1

    if not math.isnan(delta):
        gwin = state.gains + [gain]
        lwin = state.losses + [loss]
    else:
        gwin, lwin = state.gains, state.losses
    if state.n_delta >= RSI_WINDOW and len(gwin) >= RSI_WINDOW:
        avg_gain = sum(gwin) / RSI_WINDOW
        avg_loss = sum(lwin) / RSI_WINDOW
    else:
        avg_gain = avg_loss = math.nan

    rs = math.nan if (math.isnan(avg_loss) or avg_loss == 0.0) else avg_gain / avg_loss
    rsi = 100.0 - 100.0 / (1.0 + rs) if not math.isnan(rs) else math.nan

    if math.isnan(sma) or math.isnan(ema_out) or math.isnan(rsi):
        signal = HOLD
    elif sma > ema_out and rsi < 70:
        signal = BUY
    elif sma < ema_out and rsi > 30:
        signal = SELL
    else:
        signal = HOLD

    # roll buffers
    state.closes = window[-(SMA_WINDOW - 1):]
    if not math.isnan(delta):
        state.gains = gwin[-(RSI_WINDOW - 1):]
        state.losses = lwin[-(RSI_WINDOW - 1):]
    state.last_close = close
    state.last_time_us = time_us

    return {
        "sma_5": sma,
        "ema_10": ema_out,
        "delta": delta,
        "gain": gain,
        "loss": loss,
        "avg_gain_10": avg_gain,
        "avg_loss_10": avg_loss,
        "rs": rs,
        "rsi_10": rsi,
        "signal": signal,
    }


def process_group(state: SymbolState, pdf: pd.DataFrame, time_col: str, close_col: str) -> pd.DataFrame:
    """Run :func:`step` over one key's micro-batch rows in event-time order.

    Rows with no usable close — NULL (``float(None)`` would kill the
    whole streaming query for one malformed exchange record; Arrow also
    surfaces SQL NULL as NaN in float chunks) or NaN (it would poison
    the EMA recursion permanently) — are QUARANTINED: skipped, never
    emitted, no state advance.  Iteration uses ``to_dict`` —
    ``itertuples`` positionally renames column names that are not valid
    Python identifiers (``24h_vol`` → ``_3``), silently corrupting the
    output schema."""
    pdf = pdf.sort_values(time_col, kind="stable")
    out_rows = []
    for d in pdf.to_dict("records"):
        close = d[close_col]
        if close is None or (isinstance(close, float) and math.isnan(close)):
            continue  # no usable price: quarantined
        ts = d[time_col]
        time_us = int(pd.Timestamp(ts).value // 1000)
        res = step(state, float(close), time_us)
        if res is not None:
            out_rows.append({**d, **res})
    return pd.DataFrame(out_rows)
