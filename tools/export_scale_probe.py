"""SCALE.md probe: the training-data export family at 1x (sf0.1) vs 10x
(.scratch/sf1x — tools/make_scaled_sf.py) — the r8 verdict's ask #4.

Three measurements per SF:

* ``corpus_shards`` (corpus_shuffle): wall time + shard balance
  (max shard / fair share) — the single-hash-shuffle claim is only
  worth anything if the shards stay balanced as the corpus grows.
* ``global_index``: wall time — two-pass offset form, expected ~linear.
* ``token_budget_mix``: wall time + the boundedness stats the operator
  exposes (window_input_rows / max_task_rows), run BOTH on the natural
  lang mixture and on a synthetic hot-domain skew (every row mapped to
  one domain, budget ≪ corpus) — per-task window input must stay
  bounded by the range-partition size, and the offset prefilter must
  keep the window's total input near the budget mass, not the corpus.

Usage: python tools/export_scale_probe.py [sf_dir] [runs]
Prints one JSON line; pin the numbers in PERF.md next to the other
family probes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark import get_spark
from big_data_engineering_financial_analysis_spark.operators import export, text

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N_PARTS = 32

spark = get_spark("export-probe")
docs = (
    spark.read.parquet(f"{sf_dir}/documents.parquet")
    .withColumn("n_tokens", F.size(text.tokens(F.col("text"))).cast("long"))
    .select("doc_id", "lang", "n_tokens")
    .localCheckpoint()  # pin the token prep OUT of every measurement
)
n = docs.count()
out = {"sf_dir": sf_dir, "rows": n}


def best(fn):
    obs = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        obs.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    return obs


def _noop(df):
    df.write.mode("overwrite").format("noop").save()


# 1) corpus_shuffle: time + shard balance
obs = best(lambda: _noop(export.corpus_shuffle(docs, n_shards=N_PARTS, seed=42)))
sizes = [
    r["c"]
    for r in export.corpus_shuffle(docs, n_shards=N_PARTS, seed=42)
    .groupBy("shard")
    .agg(F.count(F.lit(1)).alias("c"))
    .collect()
]
out["corpus_shuffle"] = {
    "obs": obs,
    "min": min(obs),
    "shards": len(sizes),
    "max_over_fair": round(max(sizes) / (n / N_PARTS), 3),
}

# 2) global_index
obs = best(
    lambda: _noop(
        export.global_index(docs, ["lang", "n_tokens"], num_partitions=N_PARTS)
    )
)
out["global_index"] = {"obs": obs, "min": min(obs)}

# 3) token_budget_mix — natural mixture (registry budgets scaled to keep
# the hot domain partially cut at any SF), then worst-case skew: the
# WHOLE corpus in one domain with a budget ~1% of its token mass.
total_tokens = docs.agg(F.sum("n_tokens")).collect()[0][0]
natural = {"en": max(5000, total_tokens // 20), "de": 2000, "zh": 10**12}
for label, frame, budgets in [
    ("mix_natural", docs, natural),
    (
        "mix_hot_domain",
        docs.withColumn("lang", F.lit("hot")),
        {"hot": max(1, total_tokens // 100)},
    ),
]:
    stats: dict = {}
    obs = best(
        lambda f=frame, b=budgets, s=stats: _noop(
            export.token_budget_mix(
                f, b, domain_col="lang", num_partitions=N_PARTS, stats=s
            )
        )
    )
    out[label] = {
        "obs": obs,
        "min": min(obs),
        "input_rows": stats.get("input_rows"),
        "window_input_rows": stats.get("window_input_rows"),
        "max_task_rows": stats.get("max_task_rows"),
    }

print(json.dumps(out))
spark.stop()
