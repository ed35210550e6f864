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


# --------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API)
# --------------------------------------------------------------------------
# The successor tier to applyInPandasWithState: named state variables
# (ValueState/ListState/MapState) instead of one tuple row, explicit
# timers, and a RocksDB-backed store so per-key state spills to disk
# instead of capping at executor memory — the property that matters when
# the key space is user_id at 100 TB, not event_type's handful of keys.

TWS_OUTPUT_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("n_events", LongType()),
    StructField("max_value", DoubleType()),
])


def _require_stateful_processor():
    from pyspark.sql.streaming import StatefulProcessor  # noqa: F401
    return StatefulProcessor


def make_peak_tracker():
    """StatefulProcessor keeping per-key (count, running max) in a named
    ValueState. Deliberately NOT equivalent to a windowed agg: the max is
    over the full stream history, state is one O(1) row per key."""
    StatefulProcessor = _require_stateful_processor()

    class PeakTracker(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState(
                "peak", StructType([StructField("n", LongType()),
                                    StructField("mx", DoubleType())]))

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, mx = self._state.get()
            else:
                n, mx = 0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                mx = max(mx, float(pdf["value"].max()))
            self._state.update((n, mx))
            yield pd.DataFrame({"event_type": [key[0]], "n_events": [n],
                                "max_value": [mx]})

        def close(self) -> None:
            pass

    return PeakTracker()


def peak_per_type(events: DataFrame) -> DataFrame:
    """Per-event-type (count, max value) across the whole stream via
    transformWithStateInPandas. Requires the RocksDB state store
    (set spark.sql.streaming.stateStore.providerClass to the RocksDB
    provider on the writeStream session; session.tune() does not force
    it because HDFS-backed state is the right default for the older
    applyInPandasWithState tier).

    ENVIRONMENT GATE: executing the query (not building the plan) needs
    `google.protobuf` — the TWS state server's wire protocol — which is
    not installed in this container, so end-to-end runs are covered by a
    protobuf-gated test plus a fake-handle unit test of the processor
    logic (tests/test_streaming.py). On a real cluster with protobuf
    present this runs as-is."""
    return events.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=make_peak_tracker(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
