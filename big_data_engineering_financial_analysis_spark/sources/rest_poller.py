"""REST candle poller — the reference's ingress loop (S1), engine edition.

The reference polls ``https://api.nobitex.ir/market/udf/history`` per
symbol every 60 s with a 2-minute lookback, takes the LAST candle of each
response, and produces it to Kafka (services/data-ingestion/app/ingest.py:
60-121).  Polling is an outside-engine concern (the engine's contract is
"candle rows arrive"), so this module is a small, dependency-injected
frame: the HTTP fetch is a callable, making the loop unit-testable without
network and swappable for any exchange API.

No network access exists in the build container — ``default_fetch`` is
gated behind an import-try and never exercised in tests.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator
from datetime import datetime, timezone

from big_data_engineering_financial_analysis_spark.schemas import SYMBOLS

#: fetch(symbol, from_epoch_s, to_epoch_s) -> list of candle dicts
FetchFn = Callable[[str, int, int], list[dict]]

LOOKBACK_S = 120  # reference: from = now - 120 (ingest.py:63)
POLL_INTERVAL_S = 60  # reference cadence (ingest.py:121)


DEFAULT_BASE_URL = "https://api.nobitex.ir/market/udf/history"


def default_fetch(
    symbol: str,
    from_s: int,
    to_s: int,
    base_url: str = DEFAULT_BASE_URL,
    timeout_s: float = 10.0,
) -> list[dict]:
    """HTTP fetch against a UDF-history-style endpoint.

    Mirrors the reference request/response handling
    (services/data-ingestion/app/ingest.py:60-121): GET with
    symbol/resolution/from/to params; a response whose ``s`` field is not
    ``"ok"`` (``"no_data"``, ``"error"``) yields no candles.  ``base_url``
    is injectable so tests drive the real HTTP branch against a local stub
    server; gated behind an import-try for stripped-down interpreters.
    """
    try:
        import urllib.request
    except Exception as exc:  # pragma: no cover
        raise NotImplementedError("no HTTP stack available") from exc
    url = f"{base_url}?symbol={symbol}&resolution=1&from={from_s}&to={to_s}"
    with urllib.request.urlopen(url, timeout=timeout_s) as resp:
        data = json.loads(resp.read())
    if data.get("s") != "ok":
        return []
    return [
        {"t": t, "o": o, "h": h, "l": l, "c": c, "v": v}
        for t, o, h, l, c, v in zip(
            data.get("t", []), data.get("o", []), data.get("h", []),
            data.get("l", []), data.get("c", []), data.get("v", []),
        )
    ]


def poll_once(
    fetch: FetchFn = default_fetch,
    symbols: list[str] | None = None,
    now_s: int | None = None,
) -> list[dict]:
    """One poll cycle: fetch each symbol's trailing window, keep the LAST
    candle (reference latest_index = -1, ingest.py:84-88)."""
    symbols = symbols or SYMBOLS
    now_s = now_s or int(time.time())
    rows = []
    for sym in symbols:
        candles = fetch(sym, now_s - LOOKBACK_S, now_s)
        if not candles:
            continue
        last = candles[-1]
        rows.append(
            {
                "stock_symbol": sym,
                "local_time": datetime.fromtimestamp(last["t"], tz=timezone.utc).replace(tzinfo=None),
                "open": float(last["o"]),
                "high": float(last["h"]),
                "low": float(last["l"]),
                "close": float(last["c"]),
                "volume": float(last["v"]),
            }
        )
    return rows


def poll_forever(
    fetch: FetchFn,
    emit: Callable[[list[dict]], None],
    symbols: list[str] | None = None,
    interval_s: int = POLL_INTERVAL_S,
    max_cycles: int | None = None,
) -> Iterator[int]:
    """The reference's infinite loop with an injectable sink and a cycle
    bound for tests.  ``emit`` receives each cycle's candle rows (Kafka
    producer, parquet appender, ...)."""
    cycle = 0
    while max_cycles is None or cycle < max_cycles:
        emit(poll_once(fetch, symbols))
        cycle += 1
        yield cycle
        if max_cycles is None or cycle < max_cycles:
            time.sleep(interval_s)
