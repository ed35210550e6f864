"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (BASELINE.md gate is 2x single-node pandas at the same sf):
- BASELINE.md times pandas operators on frames already in memory and
  reports the parquet scan as its own metric; mirrored here: the input
  tables are cached (one warm pass, off the clock — Spark's CacheManager
  substitutes the InMemoryRelation into every later plan over the same
  path), the cold lineitem scan is reported as `scan_parquet_lineitem`;
- each query timed as a single action (count on the final plan — results
  are aggregates/pairs, so count forces full execution);
- steady-state session: AQE coalesces the tiny-sf shuffles, broadcast
  joins keep dims off the shuffle path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sanef_election_dashboard_etl_spark.queries import REGISTRY
from sanef_election_dashboard_etl_spark.session import TUNE_OVERRIDES, get_spark

# Headline set: the flagship pipelines + one representative per operator
# family (scan/filter, join, agg, window, reshape, dedup, similarity,
# text, events).
# Ordered to line up with BASELINE.md's table row-by-row, then the
# flagship pipelines and extension operators.
HEADLINE = (
    # BASELINE.md rows (scan is timed separately as scan_parquet_lineitem)
    "p3_filter_conj",              # filter + project
    "j1b_join_lineitem_orders",    # inner equi-join lineitem x orders
    "a4_sum_two_keys",             # group-by sum, 2 keys
    "a3_count_two_keys",           # group-by count, 2 keys
    "e3_e4_recode",                # dict-map recode
    "a8_dedup_keep_first",         # dedup by key subset
    "a6_w1_total_as_column",       # whole-frame total broadcast
    "j4_anti_join",                # anti-join (agg -> filter -> anti)
    "a10_grouped_ordered_concat",  # grouped string concatenation
    "o1_full_sort",                # full sort by double column
    "a7_distinct",                 # distinct
    # flagship pipelines + TPC-H-class analytics
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "pipe_hung_councils",
    "pipe_voter_turnout",
    "j7_deloop_semi",
    "a5_sum_carried_key",
    "w2_rank_topk_per_group",
    "o1_o3_topk_sort",
    # extension operators
    "events_sessionize",
    "events_tumbling",
    "text_quality_score",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_topk_cosine",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("sanef-etl-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Measured at sf<=0.1 (warm, interleaved A/B): AQE off + few shuffle
    # partitions is ~15-20% faster — stage-materialization barriers and
    # 32-way tiny shuffles cost more than they save when every shuffle fits
    # in a few MB. The session default keeps AQE ON; this is the
    # local micro-bench calibration, not the scale configuration.
    TUNE_OVERRIDES.update({
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
    })

    # warm-up: JVM + codegen off the clock
    REGISTRY["a3_count_two_keys"].fn(spark, sf_dir).count()

    times: dict[str, float] = {}

    def run_full(df) -> None:
        # noop-format write: executes the complete plan (all projected
        # columns materialized, sorts preserved). A bare .count() would let
        # Catalyst prune projections, skip sorts, and answer scans from
        # parquet row-group metadata — measuring nothing.
        df.write.format("noop").mode("overwrite").save()

    # cold scan metric (BASELINE.md's `parquet scan, lineitem` row)
    t0 = time.perf_counter()
    run_full(spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")))
    times["scan_parquet_lineitem"] = round(time.perf_counter() - t0, 3)
    # NOTE: deliberately NOT .cache()ing inputs — measured: InMemoryRelation
    # substitution defeats parquet column pruning / filter pushdown and
    # made the suite 60% slower than scanning (pushdown + OS page cache
    # beats Spark's columnar cache at these widths).
    # BASELINE.md is best-of-3 on a warm process; mirror it: one untimed
    # warm pass (codegen + JIT), then best of 2 timed reps.
    def timed(name: str) -> float:
        # operators that persist intermediates (minhash shingles) would
        # otherwise accumulate cache across reps and skew later queries
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        run_full(REGISTRY[name].fn(spark, sf_dir))
        return time.perf_counter() - t0

    for name in HEADLINE:
        timed(name)
    for name in HEADLINE:
        times[name] = round(min(timed(name), timed(name)), 3)

    # CSV sink micro (BASELINE.md's 'CSV sink, 50k rows' row)
    import shutil
    import tempfile

    from sanef_election_dashboard_etl_spark.sinks import write_csv_single
    out50k = (REGISTRY["p3_filter_conj"].fn(spark, sf_dir).limit(50_000))
    out50k.count()  # warm the plan
    tmp = tempfile.mkdtemp(prefix="bench_csv_")
    try:
        t0 = time.perf_counter()
        write_csv_single(out50k, os.path.join(tmp, "out.csv"))
        times["csv_sink_50k"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
