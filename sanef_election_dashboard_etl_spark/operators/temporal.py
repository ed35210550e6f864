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


def resample_gap_fill(df: DataFrame, time_col: str = "ts",
                      step: int = 3600,
                      group_col: str = "event_type") -> DataFrame:
    """Regular time-series resample with explicit empty buckets: per-group
    counts on a `step`-second grid spanning the table's full time range,
    ZERO rows where nothing happened (a dashboard line chart or rate
    monitor needs the gap, not a missing row — the reference's snapshot
    tables never face this because the API re-sends full state,
    SANEF_Uploader.py:427-).

    Scale shape: the aggregate is the only data-sized operation (one
    map-side-combinable groupBy). The grid is generated, not scanned —
    global (min, max) epoch from a 1-row agg, sequence()-exploded to
    span/step rows x distinct groups, both O(timeline), independent of
    event count — then one join keyed (bucket, group) against the
    aggregate, which is already partitioned by those keys (exchange
    reuse). Epoch-bucket arithmetic (ts cast long), engine-exact."""
    bucket = (F.floor(F.col(time_col).cast("long") / step) * step) \
        .cast("long")
    counts = (df.groupBy(bucket.alias("bucket_start"),
                         F.col(group_col))
                .agg(F.count(F.lit(1)).alias("n_events")))
    bounds = df.agg(F.min(bucket).alias("lo"), F.max(bucket).alias("hi"))
    grid = (bounds.select(F.explode(
                F.sequence("lo", "hi", F.lit(step))).alias("bucket_start"))
            .crossJoin(df.select(group_col).distinct()))
    return (grid.join(counts, ["bucket_start", group_col], "left")
                .na.fill({"n_events": 0}))


def interval_join(points: DataFrame, intervals: DataFrame,
                  time_col: str, start_col: str, end_col: str,
                  bin_width: int = 7 * 86400) -> DataFrame:
    """Range join: every (point, interval) pair with start <= t < end,
    WITHOUT a cartesian product. Each interval is replicated to the
    `bin_width`-second bins it overlaps (sequence + explode — for
    intervals shorter than bin_width that is <= 2 bins); each point lands
    in exactly one bin; the join is then a plain equi-join on the bin id
    plus a residual containment filter.

    This is the standard bin-bucketed range join (what Databricks' range
    join hints do under the hood): shuffle keys are bins, so cost scales
    with points + replicated intervals, never |points| x |intervals|.
    Pick bin_width ~ the typical interval length: wider bins replicate
    less but pack more false candidates per bin; narrower the reverse.
    Intervals must satisfy end > start (end is exclusive)."""
    def epoch(c: str):
        # NTZ columns can't cast straight to long; the ltz hop is exact
        # under the engine's fixed UTC session timezone (session.py)
        return F.col(c).cast("timestamp_ltz").cast("long")

    t = epoch(time_col)
    pb = points.withColumn("__bin", F.floor(t / bin_width))
    ib = intervals.withColumn("__bin", F.explode(F.sequence(
        F.floor(epoch(start_col) / bin_width),
        F.floor((epoch(end_col) - 1) / bin_width))))
    return (pb.join(ib, "__bin")
              .filter((t >= epoch(start_col)) & (t < epoch(end_col)))
              .drop("__bin"))


def last_touch_attribution(events: DataFrame,
                           touch_type: str = "click",
                           conversion_type: str = "purchase",
                           id_col: str = "event_id",
                           user_col: str = "user_id",
                           ts_col: str = "ts",
                           pack_base: int = 10_000_000) -> DataFrame:
    """Last-touch attribution: each conversion credits the user's most
    recent touch at-or-before it (NULL = organic), with the
    touch-to-conversion lag in seconds.

    ONE user-keyed running window, no join: the candidate touch rides
    as an integer-PACKED (epoch_seconds, event_id) key
    (t * pack_base + id), so a plain MAX over the running frame is an
    ignore-nulls last-value in pure bigint arithmetic — deterministic
    tie-break (same-second touch with a smaller id sorts before the
    conversion and is credited), engine-exact, one mod/div decode.
    Requires ids < pack_base (caller contract; 1e7 covers the fixtures
    through sf1 — raise it for larger id spaces, headroom to ~9e11
    at epoch-seconds scale). At 100 TB this is a single partial-window
    pass per user: state is one bigint.
    Output (conversion id, user, t, attributed touch id, lag_secs).
    """
    from pyspark.sql import Window

    e = (events.filter(F.col("event_type").isin(touch_type,
                                                conversion_type))
         .select(F.col(id_col), F.col(user_col), F.col("event_type"),
                 F.col(ts_col).cast("long").alias("__t")))
    w = (Window.partitionBy(user_col).orderBy("__t", id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    k = F.max(F.when(F.col("event_type") == touch_type,
                     F.col("__t") * pack_base + F.col(id_col))).over(w)
    return (e.withColumn("__k", k)
            .filter(F.col("event_type") == conversion_type)
            .select(F.col(id_col).alias("conversion_event_id"),
                    F.col(user_col),
                    F.col("__t").alias("t_conversion"),
                    (F.col("__k") % pack_base).cast("long")
                     .alias("attributed_event_id"),
                    (F.col("__t") - F.expr(f"__k div {pack_base}L"))
                     .cast("long").alias("lag_secs")))


def peak_concurrency(intervals: DataFrame, start_col: str = "t_start",
                     end_col: str = "t_end") -> DataFrame:
    """Sweep-line peak concurrency: the maximum number of
    simultaneously-open intervals, and the earliest time it is reached
    — capacity planning's load question (peak concurrent sessions /
    streams / connections) answered without expanding any interval.

    Classic sweep: every interval contributes +1 at start and -1 at
    end; the peak is the max of the running sum. Ends sort BEFORE
    starts at the same instant (phase 0 < 1), so touching intervals
    [a,t) [t,b) never double-count and zero-length intervals count
    zero. Deltas are AGGREGATED per (t, phase) before the sweep, so
    the ordered scan runs over the distinct-boundary table — bounded
    by the time domain, not the event count; the running sum itself is
    one window over that reduced table (at a 100 TB time domain, swap
    in the global_row_number two-pass prefix construction — same
    per-partition-sums + offsets shape, documented trade). Integer-
    exact throughout. Output: ONE row (peak, t_at_peak).
    """
    from pyspark.sql import Window

    s = intervals.select(F.col(start_col).cast("long").alias("t"),
                         F.lit(1).alias("phase"),
                         F.lit(1).cast("long").alias("d"))
    e = intervals.select(F.col(end_col).cast("long").alias("t"),
                         F.lit(0).alias("phase"),
                         F.lit(-1).cast("long").alias("d"))
    pts = (s.unionByName(e)
           .groupBy("t", "phase")
           .agg(F.sum("d").cast("long").alias("delta")))
    w = Window.orderBy("t", "phase").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    run = pts.withColumn("c", F.sum("delta").over(w))
    peak = run.agg(F.max("c").cast("long").alias("peak"))
    return (run.crossJoin(F.broadcast(peak))
            .filter(F.col("c") == F.col("peak"))
            .groupBy("peak")
            .agg(F.min("t").cast("long").alias("t_at_peak"))
            .select("peak", "t_at_peak"))


def interval_coverage(intervals: DataFrame, start_col: str = "t_start",
                      end_col: str = "t_end") -> DataFrame:
    """Union length of intervals (total covered seconds) + contiguous
    segment count — the uptime/busy-time sibling of `peak_concurrency`
    (how LONG was at least one session open, and in how many stretches),
    computed on the same aggregated boundary sweep without expanding a
    single interval.

    Ordering here puts starts BEFORE ends at equal instants (phase
    start=0 < end=1 — the opposite of peak_concurrency's tie), so
    touching intervals [a,t) [t,b) merge into ONE covered segment.
    Zero/negative-length intervals are dropped up front (they cover
    nothing and would otherwise mint empty segments). Per boundary row:
    if the running count is positive, the span to the next boundary is
    covered; a segment begins where the count crosses 0 -> positive.
    Integer-exact; same distinct-boundary scale note as the peak sweep.
    Output: ONE row (covered_secs, n_segments).
    """
    from pyspark.sql import Window

    iv = intervals.filter(F.col(end_col) > F.col(start_col))
    s = iv.select(F.col(start_col).cast("long").alias("t"),
                  F.lit(0).alias("phase"),
                  F.lit(1).cast("long").alias("d"))
    e = iv.select(F.col(end_col).cast("long").alias("t"),
                  F.lit(1).alias("phase"),
                  F.lit(-1).cast("long").alias("d"))
    pts = (s.unionByName(e)
           .groupBy("t", "phase")
           .agg(F.sum("d").cast("long").alias("delta")))
    w = Window.orderBy("t", "phase")
    run = (pts
           .withColumn("c", F.sum("delta").over(
               w.rowsBetween(Window.unboundedPreceding,
                             Window.currentRow)))
           .withColumn("__next_t", F.lead("t").over(w)))
    covered = F.sum(F.when(F.col("c") > 0,
                           F.col("__next_t") - F.col("t"))
                     .otherwise(F.lit(0))).cast("long")
    opens = F.sum(F.when((F.col("c") > 0) &
                         (F.col("c") - F.col("delta") == 0) &
                         (F.col("delta") > 0), 1)
                   .otherwise(0)).cast("long")
    return run.agg(covered.alias("covered_secs"),
                   opens.alias("n_segments"))


def linear_attribution(events: DataFrame, touch_type: str = "click",
                       conversion_type: str = "purchase",
                       id_col: str = "event_id",
                       user_col: str = "user_id",
                       ts_col: str = "ts") -> DataFrame:
    """Multi-touch LINEAR attribution: every conversion's credit is
    split equally (1/n) across ALL of the user's touches at-or-before
    it — the credit model marketing mix uses when last-touch
    over-rewards the final click. Organic conversions (no prior touch)
    emit no rows here; `last_touch_attribution` surfaces them as NULLs.

    Shape: one user-keyed equi-join between the user's touches and
    conversions with the at-or-before predicate — per-user bounded
    (never a global cartesian; users' touch counts bound the fan-out,
    the same contract as sessionization state), then one conversion-
    keyed count for n. The weight 1.0/n is a single exact division of
    a literal by a bigint — engine-identical. Ties: a same-second
    touch with a smaller id counts (the last_touch ordering, applied
    as (t, id) lexicographic comparison).
    Output (conversion_event_id, touch_event_id, lag_secs, weight).
    """
    e = events.select(F.col(id_col), F.col(user_col),
                      F.col("event_type"),
                      F.col(ts_col).cast("long").alias("__t"))
    touches = (e.filter(F.col("event_type") == touch_type)
               .select(F.col(user_col),
                       F.col(id_col).alias("touch_event_id"),
                       F.col("__t").alias("__tt")))
    convs = (e.filter(F.col("event_type") == conversion_type)
             .select(F.col(user_col),
                     F.col(id_col).alias("conversion_event_id"),
                     F.col("__t").alias("__tc")))
    pairs = (convs.join(touches, user_col)
             .filter((F.col("__tt") < F.col("__tc")) |
                     ((F.col("__tt") == F.col("__tc")) &
                      (F.col("touch_event_id") <
                       F.col("conversion_event_id")))))
    n = (pairs.groupBy("conversion_event_id")
         .agg(F.count(F.lit(1)).cast("long").alias("__n")))
    return (pairs.join(F.broadcast(n), "conversion_event_id")
            .select("conversion_event_id", "touch_event_id",
                    (F.col("__tc") - F.col("__tt")).cast("long")
                     .alias("lag_secs"),
                    (F.lit(1.0) / F.col("__n").cast("double"))
                     .alias("weight")))
