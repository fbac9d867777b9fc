"""Generate a scaled-up benchmark dataset by replicating an existing SF dir.

Usage:
    python tools/make_scaled_sf.py [--src /root/testdata/sf0.1] \
        [--out .scratch/sf1x] [--factor 10]

Then point the normal bench at it:
    SPARK_GRAFT_SF_DIR=.scratch/sf1x python bench.py

Replication strategy (per table):
* ``events``     — replicas shift ``user_id``/``event_id`` into disjoint
  ranges, so key cardinality grows with the factor (matching how the
  driver's own generator scales: sf0.01→sf0.1 went 150→1500 users at a
  constant ~67 rows/key).  Window/enrichment parallelism therefore scales
  the way it would in production.
* ``documents``  — ``doc_id`` shifted; replica text gets a short replica
  marker appended so cross-replica rows are NOT trivial exact/near dups
  (a 10x corpus of identical copies would measure the dup-explosion
  pathology, not scaling).  Within-replica duplicate structure is
  preserved.
* ``embeddings`` — ``vec_id`` shifted; replica vectors perturbed by a
  tiny deterministic per-replica epsilon (cosine structure preserved,
  exact collisions avoided).  Query ids (low ids) stay present.
* dimension-ish tables (region nation customer supplier part orders
  lineitem) — copied as-is: the document/embedding family is what this
  scaled set exists to measure; the relational ×10 curve was measured
  separately (PERF.md round-2 findings) by replicating the fact tables.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# disjoint-id offsets comfortably above any real id in the source data
USER_STRIDE = 1_000_000
DOC_STRIDE = 10_000_000
VEC_STRIDE = 10_000_000
EVENT_STRIDE = 1_000_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=".scratch/sf1x")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from big_data_engineering_financial_analysis_spark import get_spark
    from big_data_engineering_financial_analysis_spark.sources.parquet import load_table

    spark = get_spark("make-scaled-sf")
    os.makedirs(args.out, exist_ok=True)
    reps = F.explode(F.sequence(F.lit(0), F.lit(args.factor - 1))).alias("k")

    for t in TABLES:
        dst = os.path.join(args.out, f"{t}.parquet")
        if t not in ("events", "documents", "embeddings"):
            shutil.copyfile(os.path.join(args.src, f"{t}.parquet"), dst)
            continue
        df = load_table(spark, args.src, t).select("*", reps)
        if t == "events":
            k_long = F.col("k").cast("long")
            df = df.withColumn("user_id", F.col("user_id").cast("long") + k_long * USER_STRIDE)
            df = df.withColumn("event_id", F.col("event_id").cast("long") + k_long * EVENT_STRIDE)
        elif t == "documents":
            df = df.withColumn("doc_id", F.col("doc_id").cast("long") + F.col("k").cast("long") * DOC_STRIDE)
            df = df.withColumn(
                "text",
                F.when(F.col("k") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" replica "), F.col("k").cast("string"))
                ),
            )
        else:  # embeddings
            df = df.withColumn("vec_id", F.col("vec_id").cast("long") + F.col("k").cast("long") * VEC_STRIDE)
            eps = F.col("k").cast("double") * 1e-4
            df = df.withColumn(
                "embedding", F.transform(F.col("embedding"), lambda x: x + eps)
            )
        # one file per ~core keeps the scan well-partitioned without relying
        # on maxPartitionBytes splitting of a single file
        df.drop("k").repartition(32).write.mode("overwrite").parquet(dst)
        print(f"{t}: wrote {dst}")
    spark.stop()


if __name__ == "__main__":
    main()
