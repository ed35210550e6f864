"""One-pass table profiling (data-quality observability).

A 100 TB ingest needs schema-drift and quality monitoring BEFORE anything
trains on the data: null-rate spikes, cardinality collapses, and range
drift are the classic upstream-pipeline failures (the Deequ/dbt-test
problem). The reference has no equivalent (it trusts its SQL tables,
SANEF_Uploader.py:33-38); this is the Spark-native profiler the engine's
own fixtures are validated with.

Scale design: ONE aggregate pass computes every column's stats
simultaneously (count/nulls/exact-distinct/min/max as a single wide agg —
Spark plans the distincts via one expand + partial aggs, still one scan of
the table), then a `stack` unpivot reshapes the single result row into one
row per column. No per-column jobs, no driver-side loops; cost is the one
scan regardless of column count. For very-high-cardinality columns where
exact distinct's expand shuffle hurts, `approx=True` swaps in HLL
approx_count_distinct (narrower, one partial agg, documented estimate).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: Sequence[str] | None = None,
            approx: bool = False) -> DataFrame:
    """Per-column profile in one scan:
    (column_name, n_rows, n_nulls, n_distinct, min_value, max_value).

    min/max are canonical strings so the output schema is uniform across
    column types (numeric strings round-trip exactly for integral and
    x.0-double values; timestamp columns should be profiled via an
    explicit date_format projection if cross-engine string parity
    matters — Spark and SQL engines disagree on trailing fractional
    zeros)."""
    cols = list(cols or df.columns)
    nd = (lambda c: F.approx_count_distinct(c)) if approx \
        else (lambda c: F.count_distinct(F.col(c)))
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            nd(c).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols)
    return (row.selectExpr(
        "__n",
        f"stack({len(cols)}, {stacked}) AS "
        "(column_name, __nn, n_distinct, min_value, max_value)")
        .select("column_name",
                F.col("__n").cast("long").alias("n_rows"),
                (F.col("__n") - F.col("__nn")).cast("long").alias("n_nulls"),
                F.col("n_distinct").cast("long").alias("n_distinct"),
                "min_value", "max_value"))
