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


def test_batch_pipeline_runs_unchanged_on_stream(spark, tmp_path):
    """The capstone streaming claim: plans/pipelines.hung_councils — a pure
    batch DataFrame function — runs UNCHANGED on a streaming source in
    complete mode, reproducing the reference's overwrite-upload loop."""
    from sanef_election_dashboard_etl_spark.plans.pipelines import hung_councils
    from sanef_election_dashboard_etl_spark.streaming.pipelines import (
        run_snapshot_pipeline,
    )

    munis = spark.createDataFrame(
        [(1, 101, "BUF", "Buffalo City", 1), (3, 301, "JHB", "Johannesburg", 1)],
        "ProvinceID int, MunicipalityID int, Municipality string, "
        "MunicipalityName string, MunicTypeID int")
    cw_schema = ("pklCouncilWinnerID long, fklEEID int, fklMunicipalityID int, "
                 "fklPartyID int, fklLeadingPartyID int, fklMajorityPartyID int, "
                 "lCouncilSeatsAvailable int, lTotalPartySeatsWon int, "
                 "bDraw int, bHung int")

    src = tmp_path / "cw_src"
    src.mkdir()
    b1 = spark.createDataFrame(
        [(1, 1091, 101, 7, 7, 7, 10, 6, 0, 1)], cw_schema)
    b1.coalesce(1).write.mode("append").parquet(str(src))

    snapshots = []

    def write_batch(df, epoch_id):
        snapshots.append(sorted(tuple(r) for r in df.collect()))

    stream = spark.readStream.schema(cw_schema).option(
        "maxFilesPerTrigger", "1").parquet(str(src))
    q = run_snapshot_pipeline(lambda df: hung_councils(df, munis), stream,
                              write_batch, checkpoint=str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
        first = snapshots[-1]
        # second batch arrives: JHB outright winner -> snapshot recomputes
        b2 = spark.createDataFrame(
            [(2, 1091, 301, 8, 8, 8, 10, 6, 0, 0)], cw_schema)
        b2.coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        second = snapshots[-1]
    finally:
        q.stop()

    assert first == [("EC", "Hung", 1), ("EC", "Outright Majority", 0)]
    assert second == [("EC", "Hung", 1), ("EC", "Outright Majority", 0),
                      ("GT", "Hung", 0), ("GT", "Outright Majority", 1)]
    # and the SAME function on the same data as a plain batch agrees
    batch = spark.read.parquet(str(src))
    assert sorted(tuple(r) for r in hung_councils(batch, munis).collect()) == second


def test_sliding_counts_batch_semantics(spark):
    """Native sliding windows: an event at minute 7 lands in both the
    [0,10) and [5,15) windows."""
    out = W.sliding_counts(_events_df(spark), "10 minutes", "5 minutes")
    by_start = {((r["window_start"].hour, r["window_start"].minute),
                 r["event_type"]): r["n_events"] for r in out.collect()}
    assert by_start[((0, 0), "click")] == 2      # minutes 0,2 in [00:00,00:10)
    assert by_start[((23, 55), "click")] == 2    # ...and in [23:55,00:05)
    assert by_start[((0, 55), "click")] == 1     # minute 61 in [00:55,01:05)
    assert by_start[((1, 0), "click")] == 1      # ...and in [01:00,01:10)
    assert by_start[((0, 0), "view")] == 1 and by_start[((0, 5), "view")] == 1


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps one row per key in-horizon."""
    from datetime import datetime, timedelta
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    src = tmp_path / "dd_src"
    src.mkdir()
    spark.createDataFrame(
        [(1, t0, "docA"), (2, t0 + timedelta(minutes=1), "docA"),  # dup
         (3, t0 + timedelta(minutes=2), "docB"),
         (4, t0 + timedelta(minutes=3), "docB"),                   # dup
         (5, t0 + timedelta(minutes=4), "docC")],
        "event_id long, ts timestamp, fp string",
    ).coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = (spark.readStream
              .schema("event_id long, ts timestamp, fp string")
              .parquet(str(src)))
    deduped = W.dedup_stream(stream, ["fp"], "ts", "10 minutes")
    q = (deduped.writeStream.format("memory").queryName("t_dd")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
         .start())
    try:
        q.processAllAvailable()
        got = sorted(r["fp"] for r in spark.sql(
            "SELECT fp FROM t_dd").collect())
    finally:
        q.stop()
    assert got == ["docA", "docB", "docC"]


def test_stream_static_enrich_join(spark, tmp_path):
    """readStream -> stream-static broadcast join -> memory sink: each
    micro-batch row is enriched from the static dim."""
    src = tmp_path / "enrich_src"
    src.mkdir()
    _events_df(spark).coalesce(1).write.mode("overwrite").parquet(str(src))
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "passive")],
        "event_type string, category string")

    stream = (spark.readStream
              .schema("event_id long, ts timestamp, event_type string, value double")
              .parquet(str(src)))
    q = (W.enrich_stream(stream, dim, "event_type")
         .writeStream.format("memory").queryName("enriched")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {r["event_id"]: r["category"]
           for r in spark.sql("SELECT * FROM enriched").collect()}
    assert got == {1: "engagement", 2: "engagement",
                   3: "passive", 4: "engagement"}


def test_streaming_curation_against_reference_lm(spark, tmp_path):
    """Ingest-time curation: a document stream is scored per micro-batch
    against a STATIC reference LM (the CCNet wiring — reference counts
    computed once, each arriving batch joins them) via foreachBatch; the
    batch operator runs unchanged."""
    from sanef_election_dashboard_etl_spark.operators import text as T

    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)],
        "doc_id long, text string")

    src = tmp_path / "cur_src"
    src.mkdir()
    incoming = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),
         (101, "zz qq xx vv kk jj ww yy")],
        "doc_id long, text string")
    incoming.coalesce(1).write.mode("overwrite").parquet(str(src))

    scored = []

    def write_batch(df, epoch_id):
        out = T.lm_cross_entropy(df, lm=ref)
        scored.extend((r["doc_id"], r["cross_entropy"])
                      for r in out.collect())

    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(str(src)))
    q = (stream.writeStream.foreachBatch(write_batch)
         .option("checkpointLocation", str(tmp_path / "cur_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = dict(scored)
    # the in-distribution doc must score strictly lower than the
    # out-of-vocabulary doc under the reference LM
    assert got[100] < got[101]


def test_streaming_ingest_dedup_bloom_against_static_corpus(spark, tmp_path):
    """Ingest-time incremental dedup: each arriving micro-batch is
    admitted against a STATIC corpus through the Bloom-prefiltered path
    (dedup.incremental_dedup_bloom) in foreachBatch — the daily-crawl
    wiring where the corpus digest set is fixed for the stream's
    lifetime and only the (small) batch flows. The batch operator runs
    unchanged; at cluster scale the bloom words build once and every
    micro-batch probes them with zero corpus shuffles."""
    from sanef_election_dashboard_etl_spark.operators import dedup as D

    corpus = spark.createDataFrame(
        [(i, f"seen document body {i}") for i in range(50)],
        "doc_id long, text string")

    src = tmp_path / "bloom_src"
    src.mkdir()
    incoming = spark.createDataFrame(
        [(1000, "seen document body 7"),        # dup of corpus doc 7
         (1001, "seen document body 23"),       # dup of corpus doc 23
         (1002, "never seen before text a"),
         (1003, "never seen before text b")],
        "doc_id long, text string")
    incoming.coalesce(1).write.mode("overwrite").parquet(str(src))

    admitted = []

    def write_batch(df, epoch_id):
        out = D.incremental_dedup_bloom(corpus, df, m_bits=1 << 12)
        admitted.extend(r["doc_id"] for r in out.collect())

    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(str(src)))
    q = (stream.writeStream.foreachBatch(write_batch)
         .option("checkpointLocation", str(tmp_path / "bloom_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert sorted(admitted) == [1002, 1003]


def test_checkpoint_restart_resumes_exactly_once(spark, tmp_path):
    """The durability contract a 100 TB ingest leans on: stop a running
    aggregation, append new input, restart from the SAME checkpoint —
    the resumed query must pick up only the unseen files (no
    reprocessing, no loss), carrying its state across the restart."""
    import pyspark.sql.functions as F

    src = tmp_path / "ck_src"
    src.mkdir()
    schema = "k string, v long"
    spark.createDataFrame([("a", 1), ("a", 2), ("b", 10)], schema) \
        .coalesce(1).write.mode("append").parquet(str(src))

    def start():
        stream = spark.readStream.schema(schema).parquet(str(src))
        agg = stream.groupBy("k").agg(F.sum("v").alias("total"),
                                      F.count("*").alias("n"))
        return (agg.writeStream.format("memory").queryName("ck_agg")
                .outputMode("complete")
                .option("checkpointLocation", str(tmp_path / "ck"))
                .start())

    q = start()
    try:
        q.processAllAvailable()
        first = {r["k"]: (r["total"], r["n"]) for r in
                 spark.sql("SELECT * FROM ck_agg").collect()}
    finally:
        q.stop()
    assert first == {"a": (3, 2), "b": (10, 1)}

    # new data lands while the query is DOWN
    spark.createDataFrame([("a", 100), ("c", 7)], schema) \
        .coalesce(1).write.mode("append").parquet(str(src))

    q2 = start()
    try:
        q2.processAllAvailable()
        second = {r["k"]: (r["total"], r["n"]) for r in
                  spark.sql("SELECT * FROM ck_agg").collect()}
        # state carried over AND the downtime batch applied exactly once
        assert second == {"a": (103, 3), "b": (10, 1), "c": (7, 1)}
        # the resumed run started from the checkpointed offset, not batch 0
        assert q2.lastProgress["batchId"] >= 1
    finally:
        q2.stop()


def test_stream_stream_interval_join(spark, tmp_path):
    """Two file streams (clicks, purchases) joined on user_id within a
    15-minute event-time interval: a purchase matches only the clicks
    that happened at-or-before it and no more than 15 minutes earlier."""
    from datetime import datetime, timedelta
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    cl, pu = tmp_path / "cl", tmp_path / "pu"
    cl.mkdir(), pu.mkdir()
    spark.createDataFrame(
        [(1, 7, t0),                              # in window of purchase @12:10
         (2, 7, t0 + timedelta(minutes=30)),      # after the purchase: no match
         (3, 8, t0 + timedelta(minutes=5)),       # user 8 click
         (4, 9, t0 - timedelta(minutes=60))],     # user 9: too early for @12:10
        "click_id long, user_id long, ts timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(str(cl))
    spark.createDataFrame(
        [(100, 7, t0 + timedelta(minutes=10)),
         (101, 8, t0 + timedelta(minutes=6)),
         (102, 9, t0 + timedelta(minutes=10))],
        "purchase_id long, user_id long, ts timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(str(pu))

    clicks = (spark.readStream
              .schema("click_id long, user_id long, ts timestamp")
              .parquet(str(cl)))
    purchases = (spark.readStream
                 .schema("purchase_id long, user_id long, ts timestamp")
                 .parquet(str(pu)))
    joined = W.interval_join_streams(clicks, purchases, "user_id",
                                     within="15 minutes")
    q = (joined.writeStream.format("memory").queryName("ss_join")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ss_ckpt"))
         .start())
    try:
        q.processAllAvailable()
        got = sorted((r["click_id"], r["purchase_id"]) for r in
                     spark.sql("SELECT * FROM ss_join").collect())
    finally:
        q.stop()
    assert got == [(1, 100), (3, 101)]


def test_transform_with_state_peak_tracker(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 named-state API): the plan
    builds against a streaming source with the declared output schema and
    the processor's pandas-side logic carries (count, max) across calls.

    End-to-end execution is gated on google.protobuf: the TWS state
    server speaks protobuf to the Python worker, and the library is not
    in this container (documented environment stub, like the multimodal
    codecs). The processor logic itself is exercised below through a
    fake state, so the pandas path is still covered."""
    import pandas as pd
    import pytest
    from sanef_election_dashboard_etl_spark.streaming.stateful import (
        make_peak_tracker, peak_per_type,
    )

    src = tmp_path / "tws_src"
    src.mkdir()
    schema = "event_id long, event_type string, value double"
    spark.createDataFrame(
        [(1, "click", 1.0), (2, "view", 5.0)], schema,
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(str(src)))
    out = peak_per_type(stream)  # plan construction must succeed
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "event_type", "n_events", "max_value"]

    # drive the processor's handleInputRows directly with a fake handle
    class _FakeState:
        def __init__(self):
            self._v = None
        def exists(self):
            return self._v is not None
        def get(self):
            return self._v
        def update(self, v):
            self._v = v

    class _FakeHandle:
        def __init__(self):
            self.state = _FakeState()
        def getValueState(self, name, schema):
            return self.state

    proc = make_peak_tracker()
    proc.init(_FakeHandle())
    [r1] = proc.handleInputRows(
        ("click",), [pd.DataFrame({"value": [1.0, 5.0]})], None)
    [r2] = proc.handleInputRows(
        ("click",), [pd.DataFrame({"value": [9.5, 2.0]})], None)
    assert (r2["n_events"][0], r2["max_value"][0]) == (4, 9.5)

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf absent: TWS state server cannot "
                    "start in this container (documented)")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
                          None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        q = (out.writeStream.format("memory")
             .queryName("tws_peak").outputMode("update")
             .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
             .start())
        try:
            q.processAllAvailable()
            spark.createDataFrame(
                [(3, "click", 9.5), (4, "click", 2.0)], schema,
            ).coalesce(1).write.mode("append").parquet(str(src))
            q.processAllAvailable()
            latest = {}
            for r in spark.sql("SELECT * FROM tws_peak").collect():
                latest[r["event_type"]] = (r["n_events"], r["max_value"])
        finally:
            q.stop()
        assert latest["click"] == (3, 9.5)
        assert latest["view"] == (1, 5.0)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev)


def test_streaming_drift_monitor_per_batch(spark, tmp_path):
    """Ingest-time drift monitoring: each arriving micro-batch's source
    mix is TVD-scored against a STATIC reference distribution via
    foreachBatch (the batch operator runs unchanged — same wiring as the
    reference-LM curation test). An in-distribution batch scores ~0; a
    skewed batch trips the gate."""
    from sanef_election_dashboard_etl_spark.operators.profile import \
        categorical_drift_tvd

    ref = spark.createDataFrame(
        [("web",)] * 6 + [("books",)] * 2 + [("code",)] * 2, "source string")

    src = tmp_path / "drift_src"
    src.mkdir()
    # batch 0: same 6/2/2 mix as the reference; batch 1: all-code skew
    spark.createDataFrame(
        [("web",)] * 6 + [("books",)] * 2 + [("code",)] * 2,
        "source string").coalesce(1).write.mode("append").parquet(str(src))

    seen = []

    def write_batch(df, epoch_id):
        row = categorical_drift_tvd(ref, df, "source").first()
        if row is not None and row["n_new"]:
            seen.append(row["tvd"])

    stream = spark.readStream.schema("source string").parquet(str(src))
    q = (stream.writeStream.foreachBatch(write_batch)
         .option("checkpointLocation", str(tmp_path / "drift_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    spark.createDataFrame([("code",)] * 10, "source string") \
        .coalesce(1).write.mode("append").parquet(str(src))
    q2 = (stream.writeStream.foreachBatch(write_batch)
          .option("checkpointLocation", str(tmp_path / "drift_ckpt"))
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)

    assert len(seen) == 2
    assert seen[0] == 0.0          # matched mix
    assert seen[1] == 0.8          # all-code vs 6/2/2: 1 - 0.2 overlap


def test_observe_stream_per_batch_metrics(spark, tmp_path):
    """observe() metrics surface in each batch's StreamingQueryProgress:
    the counts ride the batch job (no second aggregation), and the
    observed totals equal the written rows."""
    from sanef_election_dashboard_etl_spark.streaming.windows import \
        observe_stream

    src = tmp_path / "obs_src"
    src.mkdir()
    spark.createDataFrame([(i, i % 3) for i in range(30)],
                          "id long, v long") \
        .coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema("id long, v long").parquet(str(src))
    observed = observe_stream(
        stream, "ingest",
        {"n_rows": F.count(F.lit(1)), "n_v0": F.count(F.when(F.col("v") == 0, 1))})
    q = (observed.writeStream.format("memory").queryName("obs_batches")
         .option("checkpointLocation", str(tmp_path / "obs_ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = [p.observedMetrics["ingest"] for p in q.recentProgress
           if "ingest" in (p.observedMetrics or {})]
    assert got, [p.observedMetrics for p in q.recentProgress]
    assert sum(m["n_rows"] for m in got) == 30
    assert sum(m["n_v0"] for m in got) == 10
    assert spark.sql("SELECT COUNT(*) c FROM obs_batches").first()["c"] == 30


def test_incremental_ingest_stream_equals_batch(spark, tmp_path):
    """Batch<->stream equivalence property (VERDICT r4 item 5): running
    plans/pipelines.admit_increment per micro-batch over a 3-batch file
    stream of the new crawl yields EXACTLY the batch run's rows — the
    union of per-batch outputs is byte-identical because every stage is
    per-doc-key local against the static corpus."""
    from sanef_election_dashboard_etl_spark.plans.pipelines import (
        admit_increment,
    )

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    new = (docs.filter(F.col("doc_id") % 37 != 0)
           .select("doc_id",
                   F.when(F.col("doc_id") % 11 == 0,
                          F.concat(F.col("text"), F.lit(" v2")))
                   .otherwise(F.col("text")).alias("text"))
           .unionByName(
               docs.filter(F.col("doc_id") < 100)
               .select((F.col("doc_id") + 700000).alias("doc_id"),
                       "text")))
    src = tmp_path / "crawl"
    src.mkdir()
    for k in range(3):          # 3 disjoint micro-batches partition `new`
        (new.filter(F.pmod("doc_id", F.lit(3)) == k).coalesce(1)
         .write.mode("append").parquet(str(src)))

    streamed: list[tuple] = []
    n_batches = []

    def write_batch(df, epoch_id):
        streamed.extend(tuple(r)
                        for r in admit_increment(docs, df).collect())
        n_batches.append(epoch_id)

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1").parquet(str(src)))
    q = (stream.writeStream.foreachBatch(write_batch)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(n_batches) >= 3          # genuinely replayed in pieces
    batch = sorted(tuple(r) for r in admit_increment(
        docs, spark.read.parquet(str(src))).collect())
    assert sorted(streamed) == batch and batch   # identical, non-empty


def test_tvd_drift_monitor_stream_equals_batch(spark, tmp_path):
    """The TVD ingest gate replayed incrementally: each micro-batch
    appends its slice of the new snapshot and the monitor recomputes
    drift over everything seen so far. After the last batch the emitted
    row is BIT-identical (exact-integer TVD design) to the one-shot
    batch run on the same data."""
    from sanef_election_dashboard_etl_spark.operators.profile import (
        categorical_drift_tvd,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = docs.select("source")
    new = (docs.filter(F.col("doc_id") % 37 != 0)
           .select("doc_id",
                   F.when(F.col("doc_id") % 13 == 0, F.lit("recrawl"))
                   .otherwise(F.col("source")).alias("source")))
    src = tmp_path / "snap"
    src.mkdir()
    for k in range(3):
        (new.filter(F.pmod("doc_id", F.lit(3)) == k).coalesce(1)
         .write.mode("append").parquet(str(src)))

    acc = str(tmp_path / "acc")
    per_epoch = []

    def write_batch(df, epoch_id):
        df.write.mode("append").parquet(acc)
        seen = spark.read.parquet(acc).select("source")
        per_epoch.append(
            tuple(categorical_drift_tvd(old, seen, "source").collect()[0]))

    stream = (spark.readStream.schema("doc_id long, source string")
              .option("maxFilesPerTrigger", "1").parquet(str(src)))
    q = (stream.writeStream.foreachBatch(write_batch)
         .option("checkpointLocation", str(tmp_path / "ck2")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(per_epoch) >= 3
    want = tuple(categorical_drift_tvd(old, new.select("source"),
                                       "source").collect()[0])
    assert per_epoch[-1] == want        # bit-identical, incl. the double
    # the monitor's coverage grows monotonically across epochs
    assert [e[2] for e in per_epoch] == sorted(e[2] for e in per_epoch)


def test_streaming_jsonl_landing_dir_ingest(spark, tmp_path):
    """The JSONL auto-ingest loop: a landing directory of .jsonl drops is
    a streaming file source (schema-explicit, like sources.files.
    read_jsonl's batch contract) — files that arrive between micro-
    batches are picked up exactly once. The 100 TB shape: crawlers drop
    shards into the landing dir; maxFilesPerTrigger bounds each batch."""
    land = tmp_path / "landing"
    land.mkdir()
    (land / "s0.jsonl").write_text(
        '{"doc_id": 1, "text": "a b"}\n{"doc_id": 2, "text": "c"}\n')

    stream = (spark.readStream
              .schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1)
              .json(str(land)))
    q = (stream.writeStream.format("memory").queryName("t_jsonl")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_jsonl"))
         .start())
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) n FROM t_jsonl").first()["n"] == 2
        # a late-arriving shard is ingested exactly once, no reprocessing
        (land / "s1.jsonl").write_text('{"doc_id": 3, "text": "d e f"}\n')
        q.processAllAvailable()
        got = sorted(r["doc_id"] for r in
                     spark.sql("SELECT doc_id FROM t_jsonl").collect())
        assert got == [1, 2, 3]
    finally:
        q.stop()


def test_streaming_fingerprint_merge_equals_batch(spark, tmp_path):
    """The manifest fingerprints are shard-MERGEABLE (xor of xors, sum
    of sums, sum of counts) — so a streaming ingest can maintain a
    running dataset fingerprint per micro-batch and land at exactly the
    batch answer, without ever re-scanning earlier batches. This is the
    write-audit story at ingest time: the _MANIFEST a 100 TB landing
    zone keeps current costs one fold per arriving batch."""
    from sanef_election_dashboard_etl_spark.operators.profile import (
        dataset_fingerprint)

    rows = [(i, f"document body {i}", "en") for i in range(90)]
    full = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    src = tmp_path / "fp_src"
    src.mkdir()
    # three files -> three micro-batches under maxFilesPerTrigger=1
    for j in range(3):
        (spark.createDataFrame(rows[j * 30:(j + 1) * 30],
                               "doc_id long, text string, lang string")
         .coalesce(1).write.mode("append").parquet(str(src)))

    state = {"n_rows": 0, "xor_fp": 0, "sum_fp": 0, "batches": 0}

    def fold_batch(df, epoch_id):
        r = dataset_fingerprint(
            df, cols=["doc_id", "text", "lang"]).collect()[0]
        state["n_rows"] += r["n_rows"]
        state["xor_fp"] ^= r["xor_fp"]
        state["sum_fp"] += int(r["sum_fp"])
        state["batches"] += 1

    stream = (spark.readStream
              .schema("doc_id long, text string, lang string")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (stream.writeStream.foreachBatch(fold_batch)
         .option("checkpointLocation", str(tmp_path / "fp_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    batch = dataset_fingerprint(
        full, cols=["doc_id", "text", "lang"]).collect()[0]
    assert state["batches"] >= 2  # genuinely incremental, not one shot
    assert state["n_rows"] == batch["n_rows"] == 90
    assert state["xor_fp"] == batch["xor_fp"]
    assert state["sum_fp"] == int(batch["sum_fp"])


def test_streaming_data_card_state_merge_equals_batch(spark, tmp_path):
    """The incrementally-maintained data card in the streaming regime:
    each arriving micro-batch reduces to its mergeable (counts, fps)
    state via foreachBatch; states fold with data_card_merge and the
    finished card equals the batch card over everything ingested —
    the profile_data_card_incremental claim replayed across real
    micro-batch boundaries."""
    from sanef_election_dashboard_etl_spark.operators.profile import (
        data_card, data_card_from_state, data_card_merge, data_card_state)

    rows_all = [(1, "aa bb", "en", "web"), (2, "aa bb", "en", "web"),
                (3, "cc dd ee", "fr", "web"), (4, "ff", "fr", "books")]
    extra = [(5, "gg hh", "de", "books"), (6, "aa bb", "en", "books")]
    schema = "doc_id long, text string, lang string, source string"

    src = tmp_path / "card_src"
    src.mkdir()
    spark.createDataFrame(rows_all, schema).coalesce(1) \
        .write.mode("append").parquet(str(src))

    state = {}

    def write_batch(df, epoch_id):
        c, f = data_card_state(df)
        # materialize the batch's state so the fold is per-batch, not a
        # lazy re-read of the stream source
        c, f = (spark.createDataFrame(c.collect(), c.schema),
                spark.createDataFrame(f.collect(), f.schema))
        if not state:
            state["c"], state["f"] = c, f
        else:
            state["c"], state["f"] = data_card_merge(
                state["c"], state["f"], c, f)

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (stream.writeStream.foreachBatch(write_batch)
         .option("checkpointLocation", str(tmp_path / "card_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    spark.createDataFrame(extra, schema).coalesce(1) \
        .write.mode("append").parquet(str(src))
    q2 = (stream.writeStream.foreachBatch(write_batch)
          .option("checkpointLocation", str(tmp_path / "card_ckpt"))
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)

    merged = data_card_from_state(state["c"], state["f"])
    batch = data_card(spark.createDataFrame(rows_all + extra, schema))
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, batch.collect()))


def test_streaming_media_decode_equals_batch(spark, tmp_path):
    """The multimodal decode tier in the streaming regime (r6): the
    narrow mapInPandas decoder (BMP + real codec parse) applies to a
    file stream unchanged — mapInPandas is stateless per Arrow batch,
    so micro-batch boundaries cannot change any decoded value. The
    accumulated streaming output must equal the batch decode row for
    row, the multimodal leg of the batch==stream equivalence family."""
    from sanef_election_dashboard_etl_spark.operators.multimodal import (
        decode_media, synthesize_media_encoded)

    docs = spark.createDataFrame(
        [(i, f"media body {i} é") for i in range(40)],
        "doc_id long, text string")
    # r7: half BMP, half baseline JPEG — the new codec rides the same
    # stateless mapInPandas tier, so it joins the equivalence family
    media = synthesize_media_encoded(
        docs.filter(F.col("doc_id") < 20), "image").unionByName(
        synthesize_media_encoded(
            docs.filter(F.col("doc_id") >= 20), "image",
            image_format="jpeg"))

    src = tmp_path / "media_src"
    src.mkdir()
    for j in range(2):       # two files -> two micro-batches
        (media.filter((F.col("media_id") >= j * 20)
                      & (F.col("media_id") < (j + 1) * 20))
         .coalesce(1).write.mode("append").parquet(str(src)))

    got = []

    def decode_batch(df, epoch_id):
        got.extend(tuple(r) for r in decode_media(df).collect())

    stream = (spark.readStream.schema(media.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (stream.writeStream.foreachBatch(decode_batch)
         .option("checkpointLocation", str(tmp_path / "media_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    batch = sorted(tuple(r) for r in decode_media(media).collect())
    assert sorted(got) == batch
    assert len(batch) == 40
