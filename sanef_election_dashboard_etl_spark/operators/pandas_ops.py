"""The Arrow UDF tiers (SURVEY.md §2.11): scalar pandas_udf, grouped-map
applyInPandas, iterator mapInPandas.

The engine's rule is "UDFs are the slow path" — everything in the
reference's surface stayed in native expressions. These operators exist for
the cases built-ins genuinely cannot express (learned scorers, per-group
model fits) and demonstrate each tier with a real, tested computation:

- `tokens_per_char` (scalar pandas_udf): Series -> Series, Arrow-batched,
  vectorized numpy inside — the shape any custom scorer plugs into.
- `zscore_by_group` (applyInPandas): per-group normalization, the
  grouped-map tier — one shuffle on the group key, pandas frame per group.
- mapInPandas lives in sources/rest.py and operators/multimodal.py (I/O
  and decode — the iterator tier's natural home).

Scale notes: scalar UDFs are narrow (no shuffle, pipeline with codegen
stages); applyInPandas shuffles once on the group key and each group must
fit in one task's memory — bounded groups only (per-user, per-ward), never
whole-table groups.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


@F.pandas_udf(DoubleType())
def tokens_per_char(text: pd.Series) -> pd.Series:
    """Scalar Arrow UDF: whitespace-token count / char count (0.0 for
    empty). Vectorized pandas string ops; one Arrow batch in, one out."""
    n_tokens = text.str.split().str.len().fillna(0)
    n_chars = text.str.len().clip(lower=1)
    return (n_tokens / n_chars).astype("float64")


def zscore_by_group(df: DataFrame, group_col: str, value_col: str,
                    out_col: str = "zscore") -> DataFrame:
    """Grouped-map tier: per-group (x - mean) / std with population std;
    std==0 groups yield 0.0. Output keeps all input columns + `out_col`."""
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    schema = f"{fields}, `{out_col}` double"

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("float64")
        std = v.std(ddof=0)
        pdf[out_col] = 0.0 if (std == 0 or pd.isna(std)) else (v - v.mean()) / std
        return pdf

    return df.groupBy(group_col).applyInPandas(norm, schema=schema)


@F.udtf(returnType="chunk_index int, chunk_text string, n_tokens int")
class ChunkDocument:
    """Python UDTF tier (SURVEY §2.11, pyspark-4 table functions): split
    one document into fixed-size token chunks — the context-window
    chunking step of a RAG/pretraining pipeline, and the one UDF shape
    where one input row legitimately becomes MANY output rows through a
    user function (explode handles static arrays; a UDTF carries
    per-row generation logic). Used via LATERAL join:

        SELECT d.doc_id, c.* FROM docs d, LATERAL chunk_document(d.text, 8) c

    Scale: row-local (no shuffle), pipelines after the scan like any
    generator; chunking that a fixed expression can state (as here)
    should prefer the native sequence/slice form — this class is the
    TIER demonstration and the plug point for tokenizer-aware logic."""

    def eval(self, text: str, size: int):
        if text is None or not text.strip():
            return
        toks = text.split()
        for i in range(0, len(toks), size):
            chunk = toks[i:i + size]
            yield i // size, " ".join(chunk), len(chunk)
