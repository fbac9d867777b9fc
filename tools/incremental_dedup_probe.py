"""1x/10x scale probe for the incremental near-dedup kernel
(operators/dedup.incremental_minhash_dedup) — the one dedup family
member without a dedicated probe, and the subject of the r10 verdict's
conditional `_bucket_pairs` port.

What the kernel costs per micro-batch, by term:

* batch side: signatures + banding of the ARRIVING docs — O(batch).
* store side: banding of the standing signature store — O(store) rows
  through a row-local explode, then the (band, band_key) equi-join.
  The operator docstring's 100 TB answer is a parquet store persisted
  bucketed on the band key (join co-located); this probe measures the
  in-memory form's store-size scaling to see whether the per-batch
  wall is dominated by the O(store) banding pass or by the
  batch-bounded join output.

Protocol: fixed 1,000-doc batch with ~10% planted within-batch
near-dups against stores of 20,000 / 200,000 docs (10x).  Texts key on
the GLOBAL doc_id with an UNBOUNDED token progression, so batch docs
never duplicate store docs; the measured store term is the banding +
join of the standing store, not verify traffic.  Wall = full decisions
materialization, min of 3 after a global warm-up pass (the first
measured store size is not charged the session JIT).

Run on an idle machine:

    PYTHONPATH=/root/repo python tools/incremental_dedup_probe.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

from big_data_engineering_financial_analysis_spark.operators import dedup  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .appName("incdedup-probe")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def corpus(n, offset=0, dup_every=10):
    """Distinct docs except every dup_every-th, which near-copies its
    predecessor (one token changed) — a ~10% planted near-dup rate."""
    rows = []
    for i in range(n):
        doc_id = offset + i
        if i % dup_every == 9:
            base = rows[-1][1]
            text = base.replace("alpha", "omega", 1)
        else:
            # NO modulus: a bounded token space wraps doc ids (an
            # early probe draft used mod 99991 and silently made every
            # batch doc an EXACT copy of store doc id mod 99991).  The
            # unbounded progression gives near-id docs ~9% background
            # jaccard (shared shifted runs) and everything else zero.
            words = [f"tok{doc_id * 31 + j * 7}" for j in range(40)]
            text = "alpha " + " ".join(words)
        rows.append((doc_id, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


BATCH = corpus(1_000, offset=10_000_000).persist()
BATCH.count()

out = {}
for label, store_n in [("warmup", 2_000), ("1x", 20_000), ("10x", 200_000)]:
    store_sigs = dedup.minhash_signatures(corpus(store_n)).persist()
    store_sigs.count()  # store at rest, as in production
    obs = []
    for _ in range(4):
        t0 = time.monotonic()
        decisions, new_sigs = dedup.incremental_minhash_dedup(BATCH, store_sigs)
        n_dup = decisions.filter("is_dup = 1").count()
        obs.append(round(time.monotonic() - t0, 3))
        new_sigs.unpersist()
    store_sigs.unpersist()
    out[label] = {
        "store_docs": store_n,
        "obs_first_warmup": obs[0],
        "min": min(obs[1:]),
        "batch_dups_found": n_dup,
    }

out.pop("warmup")
out["ratio_10x"] = round(out["10x"]["min"] / out["1x"]["min"], 2)
print(json.dumps(out))
spark.stop()
