"""Streaming wiring test (SURVEY.md §2.10 extension): the same windowed
transformations drive a real Structured Streaming query into a memory sink;
batch tests elsewhere cover semantics (identical by design)."""

from datetime import datetime, timedelta

import pyspark.sql.functions as F
import pytest

from sanef_election_dashboard_etl_spark.streaming import windows as W

from .conftest import rows


def _events_df(spark):
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    data = [
        (1, t0, "click", 1.0),
        (2, t0 + timedelta(minutes=2), "click", 2.0),
        (3, t0 + timedelta(minutes=7), "view", 3.0),
        (4, t0 + timedelta(minutes=61), "click", 4.0),
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, event_type string, value double")


def test_tumbling_batch_semantics(spark):
    out = W.tumbling_counts(_events_df(spark), "5 minutes")
    got = rows(out, "event_type", "n_events")
    assert ("click", 2) in got and ("view", 1) in got and ("click", 1) in got


def test_session_counts_batch(spark):
    out = W.session_counts(
        _events_df(spark).withColumn("user_id", F.lit(7)), gap="30 minutes")
    got = rows(out, "n_events")
    assert got == [(1,), (3,)]  # one 3-event session, one later single


def test_streaming_end_to_end_memory_sink(spark, tmp_path):
    """Real readStream -> window agg -> memory sink round trip."""
    src = tmp_path / "stream_src"
    src.mkdir()
    _events_df(spark).coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = (spark.readStream
              .schema("event_id long, ts timestamp, event_type string, value double")
              .parquet(str(src)))
    agg = W.tumbling_counts(W.with_watermark(stream, "ts", "10 minutes"),
                            "5 minutes")
    q = (agg.writeStream.format("memory").queryName("t_win")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT event_type, n_events FROM t_win").collect()
        # append mode emits only watermark-closed windows; the three early
        # events' windows are closed by the minute-61 event
        flat = sorted((r["event_type"], r["n_events"]) for r in got)
        assert ("click", 2) in flat and ("view", 1) in flat
    finally:
        q.stop()


def test_foreach_batch_upload_sink(spark, tmp_path):
    """S9 streaming sink: the dashboard-upload adapter driven per
    micro-batch through foreachBatch."""
    import sanef_election_dashboard_etl_spark.streaming.windows as W2

    src = tmp_path / "fb_src"
    src.mkdir()
    _events_df(spark).coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = (spark.readStream
              .schema("event_id long, ts timestamp, event_type string, value double")
              .parquet(str(src)))
    agg = stream.groupBy("event_type").count()

    batches = []

    def write_batch(df, epoch_id):
        batches.append((epoch_id, sorted((r["event_type"], r["count"])
                                         for r in df.collect())))

    q = agg.writeStream.outputMode("complete").foreachBatch(write_batch) \
        .option("checkpointLocation", str(tmp_path / "fb_ckpt")).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert batches
    assert batches[-1][1] == [("click", 3), ("view", 1)]
