"""BPE apply route probe: codegen replace chain vs Arrow worker path.

Evidence for REPLACE_CHAIN_MAX_MERGES (operators/bpe.py, r13): times
``bpe_pieces`` (the chain) and ``bpe_pieces_frame(chain_max=0)`` (the
memoized mapInPandas path) over the sf0.1 documents at growing merge
counts, and records where chain CONSTRUCTION itself fails
(StackOverflow in column-node conversion, ~192 merges on Spark 4.1.2).

    PYTHONPATH=/root/repo python tools/bpe_apply_scale_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from big_data_engineering_financial_analysis_spark import get_spark
    from big_data_engineering_financial_analysis_spark.operators.bpe import (
        BPE_MERGES,
        bpe_pieces,
        bpe_pieces_frame,
    )

    spark = get_spark("bpe-apply-scale-probe")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")

    def pad_merges(n: int) -> list[tuple[str, str]]:
        m = list(BPE_MERGES)
        m += [
            (f"{a}{b}{c}", "qq")
            for a in "bcdfghjkmnpvw"
            for b in "bcdfghjkmnpvw"
            for c in "bcdfghjkmnpvw"
        ][: n - len(m)]
        return m

    def force(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    out: dict = {"chain": {}, "worker": {}}
    for n in [64, 128, 192, 256]:
        m = pad_merges(n)
        try:
            force(docs.withColumn("pieces", bpe_pieces(F.col("text"), m)))
            t0 = time.perf_counter()
            force(docs.withColumn("pieces", bpe_pieces(F.col("text"), m)))
            out["chain"][n] = round(time.perf_counter() - t0, 2)
        except Exception as e:  # noqa: BLE001 — the failure IS the datum
            out["chain"][n] = f"FAILED {type(e).__name__}"
    for n in [64, 128, 1024, 2227]:
        m = pad_merges(n)
        force(bpe_pieces_frame(docs, merges=m, chain_max=0))
        t0 = time.perf_counter()
        force(bpe_pieces_frame(docs, merges=m, chain_max=0))
        out["worker"][len(m)] = round(time.perf_counter() - t0, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
