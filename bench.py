"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (BASELINE.md gate is 2x single-node pandas at the same sf):
- one warm-up action first so JVM/codegen startup is not billed to q1;
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
from sanef_election_dashboard_etl_spark.session import get_spark

# Headline set: the flagship pipelines + one representative per operator
# family (scan/filter, join, agg, window, reshape, dedup, similarity,
# text, events).
HEADLINE = (
    "pipe_hung_councils",
    "pipe_voter_turnout",
    "j4_anti_join",
    "j7_deloop_semi",
    "a5_sum_carried_key",
    "a10_grouped_ordered_concat",
    "w2_rank_topk_per_group",
    "o1_o3_topk_sort",
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

    # warm-up: JVM + parquet footer reads off the clock
    REGISTRY["a3_count_two_keys"].fn(spark, sf_dir).count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 3)

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
