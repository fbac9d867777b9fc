"""Column-level building blocks (pure ``pyspark.sql.functions`` compositions).

Everything here returns Columns or applies narrow ``withColumn`` chains —
no shuffles beyond the window partitioning the caller asked for.
"""

from big_data_engineering_financial_analysis_spark.functions.indicators import (  # noqa: F401
    with_indicators,
    with_signal,
    enrich,
    enrich_pandas,
)
