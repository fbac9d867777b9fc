"""SCALE.md probe: semantic_dedup at sf1x under three configs —
(16 cells, hot-cell split ON), (16 cells, split OFF = pre-round-7
behavior), (160 cells = SemDeDup's cells-grow-with-corpus rule).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_engineering_financial_analysis_spark import get_spark
from big_data_engineering_financial_analysis_spark.operators.similarity import semantic_dedup

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1x"
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark("semdedup-probe")
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
n = emb.count()
out = {"sf_dir": sf_dir, "rows": n}
for label, kw in [
    ("cells16_split", {"n_cells": 16}),
    ("cells16_nosplit", {"n_cells": 16, "hot_cell": 1 << 40}),
    ("cells160_split", {"n_cells": 160}),
]:
    obs = []
    for _ in range(runs):
        t0 = time.perf_counter()
        semantic_dedup(emb, threshold=0.45, dim=64, **kw).write.mode(
            "overwrite"
        ).format("noop").save()
        obs.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    out[label] = {"obs": obs, "min": min(obs)}
print(json.dumps(out))
spark.stop()
