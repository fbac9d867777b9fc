"""HTTP layer (plans/http_api.py): live-server round-trips over plans/api.

Brings the reference's Django endpoints (views.py:122-305 + urls.py) fully
end-to-end: a real socket, real POSTs, JSON parity with the pure handlers.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from datetime import datetime

import pytest

from big_data_engineering_financial_analysis_spark.functions.indicators import enrich
from big_data_engineering_financial_analysis_spark.plans import api
from big_data_engineering_financial_analysis_spark.plans.http_api import ApiServer
from big_data_engineering_financial_analysis_spark.sources import feeder

NOW = datetime(2024, 1, 1, 1, 0, 0)


@pytest.fixture(scope="module")
def enriched(spark):
    return enrich(feeder.candles_df(spark, minutes=60)).cache()


@pytest.fixture(scope="module")
def server(enriched):
    with ApiServer(enriched, now_fn=lambda: NOW) as srv:
        yield srv


def _post(server: ApiServer, path: str, body: dict | bytes) -> tuple[int, dict]:
    data = body if isinstance(body, bytes) else json.dumps(body).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}",
        data=data,
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def test_aggregate_roundtrip_matches_pure_handler(server, enriched):
    body = {"aggregation": "avg", "field": "close", "stock_symbol": "BTCIRT",
            "period_minutes": 30}
    status, resp = _post(server, "/api/aggregate/", body)
    assert status == 200
    assert resp == api.handle_aggregate(enriched, body, NOW)


def test_summarize_roundtrip(server):
    status, resp = _post(
        server, "/api/summarize/", {"stock_symbol": "BTCIRT", "period_minutes": 60}
    )
    assert status == 200
    assert len(resp["summary"]) == 14
    assert resp["summary"]["max_close"] >= resp["summary"]["min_close"]


def test_summarize_multiple_roundtrip(server):
    status, resp = _post(
        server,
        "/api/summarize/multiple/",
        {"stock_symbols": ["BTCIRT", "ETHIRT", "MISSING"], "period_minutes": 60},
    )
    assert status == 200
    assert set(resp["results"]) == {"BTCIRT", "ETHIRT", "MISSING"}
    assert resp["results"]["MISSING"] is None
    assert len(resp["results"]["BTCIRT"]) == 14


def test_validation_error_maps_to_400(server):
    status, resp = _post(
        server, "/api/aggregate/", {"aggregation": "median", "stock_symbol": "X"}
    )
    assert status == 400 and "aggregation" in resp["error"]


def test_bad_json_is_400(server):
    status, resp = _post(server, "/api/aggregate/", b"{not json")
    assert status == 400 and "bad JSON" in resp["error"]


def test_unknown_route_404_and_get_405(server):
    status, _ = _post(server, "/api/nope/", {})
    assert status == 404
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/api/aggregate/", method="GET"
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            status = resp.status
    except urllib.error.HTTPError as err:
        status = err.code
    assert status == 405


def test_concurrent_requests(server):
    """ThreadingHTTPServer + thread-safe Spark job submission."""
    import concurrent.futures

    bodies = [
        {"aggregation": agg, "field": "close", "stock_symbol": sym, "period_minutes": 60}
        for agg in ("avg", "highest", "lowest")
        for sym in ("BTCIRT", "ETHIRT")
    ]
    with concurrent.futures.ThreadPoolExecutor(max_workers=6) as pool:
        results = list(pool.map(lambda b: _post(server, "/api/aggregate/", b), bodies))
    assert all(status == 200 for status, _ in results)
    assert all(isinstance(resp["value"], float) for _, resp in results)
