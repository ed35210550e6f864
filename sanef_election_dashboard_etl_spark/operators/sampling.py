"""Reproducible sampling for training-data pipelines (SURVEY.md §7 family).

RNG-based `df.sample()` depends on partition layout — re-partition the
input and the sample changes, which poisons dataset reproducibility. The
scale-correct pattern is HASH-MOD sampling: a row is in the p% sample iff
`hash(stable_key) mod M < p*M`. Properties:

- deterministic across runs, partitionings, and engines (portable_hash);
- composable: the 1% sample is a subset of the 10% sample (same hash);
- joinable: sampling two tables by the same key keeps them aligned.

`stratified_hash_sample` varies the rate per stratum (the class-balance
knob: downsample dominant languages, keep rare ones whole).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash

_M = 10_000  # rate resolution: 0.01%


def hash_bucket(key: Column, buckets: int = _M) -> Column:
    """Stable [0, buckets) bucket for a key column."""
    return F.pmod(portable_hash(key), F.lit(buckets))


def hash_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Deterministic `rate` sample keyed on `key_col` (narrow: a filter,
    no shuffle, pushdown-friendly)."""
    return df.filter(hash_bucket(F.col(key_col).cast("string")) <
                     F.lit(int(rate * _M)))


def stratified_hash_sample(df: DataFrame, key_col: str, stratum_col: str,
                           rates: Mapping[str, float],
                           default_rate: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling: `rates[stratum]` fraction of
    each stratum survives (unlisted strata get `default_rate`)."""
    threshold = None
    for stratum, rate in rates.items():
        cond = F.when(F.col(stratum_col) == stratum, F.lit(int(rate * _M)))
        threshold = cond if threshold is None else threshold.when(
            F.col(stratum_col) == stratum, F.lit(int(rate * _M)))
    threshold = (threshold.otherwise(F.lit(int(default_rate * _M)))
                 if threshold is not None else F.lit(int(default_rate * _M)))
    return df.filter(hash_bucket(F.col(key_col).cast("string")) < threshold)


def cap_per_group(df: DataFrame, group_col: str, cap: int,
                  order_col: str = "doc_id",
                  shuffle_order: bool = False) -> DataFrame:
    """Keep at most `cap` rows per group — the per-domain quota that web
    corpora (C4/CCNet-style) apply so one crawl-heavy domain can't
    dominate the training mix. No reference analog (the reference keeps
    every row, SANEF_Uploader.py writes full frames); this is pure
    LLM-pipeline surface.

    Deterministic: rows ranked by `order_col` within each group (or by a
    stable hash of it with `shuffle_order=True`, which decorrelates the
    kept subset from crawl/id order — hash rank, never RNG, so reruns and
    engines agree). Plan shape: one shuffle on `group_col` and a
    WindowGroupLimit — Spark pushes the rank filter into the sort, so
    each partition keeps only `cap` rows per group during the sort
    rather than ranking everything first (asserted in
    tools/explain_audit.py). Skew note: a mega-domain still sorts its
    rows in one partition; for truly pathological domains pre-filter
    with an approximate per-group count and hash_sample the giants down
    to ~cap first, then apply the exact cap."""
    from pyspark.sql import Window

    order = (portable_hash(F.col(order_col).cast("string")) if shuffle_order
             else F.col(order_col))
    w = Window.partitionBy(group_col).orderBy(order.asc(),
                                              F.col(order_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= cap)
              .drop("__rn"))
