"""Stdlib HTTP wrapper over the aggregation API (:mod:`plans.api`).

The reference exposes its serving layer through Django REST Framework
(services/aggregator_django/aggregator/views.py:122-305 + urls.py).  The
engine keeps query semantics in :mod:`plans.api` (pure functions,
request-dict in / response-dict out); this module is the ~100-line web
layer a reference user would otherwise have to write themselves — built
on :mod:`http.server` from the standard library so it runs in any Python
environment with zero extra dependencies.

Routes (all POST, JSON body, mirroring urls.py):

  /api/aggregate/            -> api.handle_aggregate
  /api/summarize/            -> api.handle_summarize
  /api/summarize/multiple/   -> api.handle_summarize_multiple

Error contract (mirrors the DRF serializer behaviour):

  400 {"error": ...}   malformed JSON body or ValidationError
  404 {"error": ...}   unknown route
  405 {"error": ...}   non-POST method on a known route
  500 {"error": ...}   unexpected engine failure (logged, not leaked)

Threading: ``ThreadingHTTPServer`` gives one thread per request; the
SparkSession is thread-safe for concurrent job submission (each request
runs an independent action), so concurrent aggregations simply become
concurrent Spark jobs sharing the FAIR/ FIFO scheduler.  At cluster scale
you would front many driver replicas with a load balancer, each holding a
cached ``enriched`` table — the handler code is identical.
"""

from __future__ import annotations

import json
import threading
from datetime import datetime
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

from pyspark.sql import DataFrame

from big_data_engineering_financial_analysis_spark.plans import api

#: route -> handler(enriched, request_dict, now) -> response_dict
ROUTES = {
    "/api/aggregate/": api.handle_aggregate,
    "/api/summarize/": api.handle_summarize,
    "/api/summarize/multiple/": api.handle_summarize_multiple,
}

MAX_BODY_BYTES = 1 << 20  # 1 MiB: requests are tiny dicts; reject abuse early


def _make_handler(enriched: DataFrame, now_fn: Callable[[], datetime]):
    class Handler(BaseHTTPRequestHandler):
        # Quiet by default; tests and embedders can re-enable.
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _reply(self, status: int, payload: dict) -> None:
            body = json.dumps(payload).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            if self.path in ROUTES:
                self._reply(405, {"error": "POST required"})
            else:
                self._reply(404, {"error": f"unknown route {self.path}"})

        def do_POST(self):  # noqa: N802
            handler = ROUTES.get(self.path)
            if handler is None:
                self._reply(404, {"error": f"unknown route {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
            except ValueError:
                length = -1
            if length < 0 or length > MAX_BODY_BYTES:
                self._reply(400, {"error": "invalid Content-Length"})
                return
            try:
                request = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(request, dict):
                    raise ValueError("body must be a JSON object")
            except ValueError as exc:
                self._reply(400, {"error": f"bad JSON body: {exc}"})
                return
            try:
                self._reply(200, handler(enriched, request, now_fn()))
            except api.ValidationError as exc:
                self._reply(400, {"error": str(exc)})
            except Exception:  # engine failure: opaque 500, details stay server-side
                self._reply(500, {"error": "internal error"})

    return Handler


class ApiServer:
    """Embeddable HTTP server over a (typically cached) enriched DataFrame.

    >>> srv = ApiServer(enriched).start()
    >>> ...  # POST to http://127.0.0.1:{srv.port}/api/summarize/
    >>> srv.stop()

    ``now_fn`` is injectable so tests (and replayed batch serving) can pin
    the trailing-window anchor; production uses wall-clock ``datetime.now``.
    """

    def __init__(
        self,
        enriched: DataFrame,
        host: str = "127.0.0.1",
        port: int = 0,
        now_fn: Optional[Callable[[], datetime]] = None,
    ) -> None:
        self._server = ThreadingHTTPServer(
            (host, port), _make_handler(enriched, now_fn or datetime.now)
        )
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> "ApiServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="api-server", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None

    def __enter__(self) -> "ApiServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
