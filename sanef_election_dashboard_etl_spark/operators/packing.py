"""Sequence packing for training-data pipelines.

Batch assembly for LLM training wants documents grouped into
fixed-token-budget bins ("packing"). True first-fit bin packing is a
stateful sequential scan — inherently serial. The scalable formulation:
split the corpus into `n_groups` deterministic hash groups, pack each
group independently by cumulative token count (bin = which budget
multiple the doc's cumsum STARTS in). Properties:

- Fully parallel: each group's window is an independent partition; one
  shuffle keyed by pack_group, never by document content.
- Deterministic: group = doc_id % n_groups, order = doc_id — stable
  across runs, cluster layouts, and engines (exact SQL twin).
- Near-budget bins: a doc can straddle a boundary, so a bin may overrun
  by at most one document's tokens (the standard streaming-packing
  trade; cap doc length upstream to bound the overrun).

At 100 TB: n_groups sized to ~executor count keeps windows
memory-bounded; the window state is one running long per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(df: DataFrame, token_col: str, budget: int,
                   n_groups: int = 8, id_col: str = "doc_id") -> DataFrame:
    """Assign each doc a (pack_group, bin_id): docs ordered by id within
    their hash group, binned by cumulative `token_col` against `budget`.
    Output: (id, pack_group, n_tokens, cum_before, bin_id), all longs."""
    g = df.select(
        F.col(id_col),
        F.col(token_col).cast("long").alias("n_tokens"),
        F.pmod(F.col(id_col), F.lit(n_groups)).cast("long").alias("pack_group"))
    w = (Window.partitionBy("pack_group").orderBy(F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (g.withColumn("cum_before",
                         (F.sum("n_tokens").over(w) - F.col("n_tokens"))
                         .cast("long"))
            .withColumn("bin_id",
                        F.floor(F.col("cum_before") / budget).cast("long"))
            .select(id_col, "pack_group", "n_tokens", "cum_before", "bin_id"))
