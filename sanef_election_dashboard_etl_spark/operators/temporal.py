"""Temporal join operators (as-of enrichment).

The reference has no temporal joins (its events are request/response
snapshots), but a training-data/event pipeline needs "most recent state
at-or-before each event" constantly. Spark has no native ASOF JOIN
(DuckDB does — the oracle uses it); the scalable formulation here is the
union-tag + windowed last() composition:

    union(left tagged, right tagged)
      -> window per key ordered by (time, side)
      -> last(value, ignorenulls) over rows unbounded-preceding..current
      -> keep left rows

Scale properties (vs the naive range join):
- ONE shuffle, keyed by the join key — both sides co-partition once; a
  range-condition join would either cartesian-explode per key or need a
  custom range partitioner.
- No per-key quadratic blowup: the window scans each key's timeline once
  (O(n log n) for the sort), regardless of how many right rows precede a
  left row.
- Skewed keys behave like any window skew (AQE can't split a window
  partition — salt the key upstream if one user owns 10% of events).

Ties: a right row at exactly the left row's timestamp matches (>=
semantics, side tag orders right before left at equal time). The right
side must be unique per (key, time) — enforce upstream (e.g.
dedup_keep_first) for deterministic output; DuckDB ASOF is
similarly tie-arbitrary on duplicate right times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, time_col: str,
              value_cols: list[str]) -> DataFrame:
    """Enrich each left row with the latest right `value_cols` whose
    `time_col` is <= the left row's, per `key`. Both inputs must carry
    `key` and `time_col`; output = left columns + value_cols (null when
    no prior right row exists)."""
    lhs = left.withColumn("__side", F.lit(1))
    for c in value_cols:
        lhs = lhs.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    rhs = right.select(
        key, time_col,
        *[F.col(c) for c in value_cols]).withColumn("__side", F.lit(0))
    # right rows order before left rows at equal time -> >= semantics
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    w = (Window.partitionBy(key).orderBy(F.col(time_col).asc(),
                                         F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for c in value_cols:
        unioned = unioned.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return unioned.filter(F.col("__side") == 1).drop("__side")
