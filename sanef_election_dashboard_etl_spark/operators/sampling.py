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
