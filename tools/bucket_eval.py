"""Bucketed co-located join evaluation: does bucketing actually remove
the join shuffle, and what does it cost/save at sf0.1?

    python tools/bucket_eval.py [sf_dir]  ->  prints table + writes the
    BUCKETING section of SCALE.md

Method: write lineitem and orders as parquet tables twice — plain and
bucketed by orderkey (16 buckets, sortBy orderkey) — then run the
fact-to-fact join + per-order aggregate both ways (broadcast disabled:
the regime bucketing exists for is BOTH sides too big to broadcast) and
count Exchange operators in the executed plan. The one-time write cost
of each layout is timed too — the bucketed write must pay a shuffle
(its clustering isn't free), which repeated joins then amortize.
"""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from sanef_election_dashboard_etl_spark.operators.layout import bucketed_write
from sanef_election_dashboard_etl_spark.session import get_spark


def _join_agg(li, od):
    """The repeated fact-to-fact shape: join on orderkey, aggregate per
    order — revenue per open order."""
    j = li.join(od, li["l_orderkey"] == od["o_orderkey"])
    return (j.filter(F.col("o_orderstatus") == "O")
            .groupBy("l_orderkey")
            .agg(F.sum(F.col("l_extendedprice") *
                       (1 - F.col("l_discount"))).alias("revenue")))


def _run(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    plan = df._jdf.queryExecution().executedPlan().toString()
    return wall, plan.count("Exchange hashpartitioning")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bucket-eval")
    spark.sparkContext.setLogLevel("ERROR")
    # both sides fact-sized: forbid broadcast so the layouts compete on
    # the shuffle they would pay on a cluster
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")

    t0 = time.perf_counter()
    li.write.format("parquet").mode("overwrite").saveAsTable("be_li_plain")
    od.write.format("parquet").mode("overwrite").saveAsTable("be_od_plain")
    t_write_plain = time.perf_counter() - t0

    t0 = time.perf_counter()
    bucketed_write(li, "be_li_bkt", ["l_orderkey"], 16,
                   sort_keys=["l_orderkey"])
    bucketed_write(od, "be_od_bkt", ["o_orderkey"], 16,
                   sort_keys=["o_orderkey"])
    t_write_bkt = time.perf_counter() - t0

    plain = _join_agg(spark.table("be_li_plain"), spark.table("be_od_plain"))
    bkt = _join_agg(spark.table("be_li_bkt"), spark.table("be_od_bkt"))
    _run(plain), _run(bkt)                       # warm
    t_plain, x_plain = min(_run(plain) for _ in range(3))
    t_bkt, x_bkt = min(_run(bkt) for _ in range(3))
    n_plain = plain.count()
    n_bkt = bkt.count()
    assert n_plain == n_bkt, (n_plain, n_bkt)
    assert x_bkt == 0, f"bucketed plan still has {x_bkt} exchanges"

    for t in ("be_li_plain", "be_od_plain", "be_li_bkt", "be_od_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    lines = [
        "## BUCKETING — measured co-located join (tools/bucket_eval.py)",
        "",
        "lineitem x orders on orderkey + per-order aggregate, broadcast",
        "disabled (the both-sides-too-big regime bucketing exists for),",
        f"sf0.1, 16 buckets sortBy orderkey, best of 3:",
        "",
        "| layout | join+agg wall | hash exchanges in plan | one-time write |",
        "|---|---|---|---|",
        f"| plain parquet | {t_plain:.2f}s | {x_plain} "
        f"(both sides + agg) | {t_write_plain:.1f}s |",
        f"| bucketed (16, sorted) | {t_bkt:.2f}s | {x_bkt} | "
        f"{t_write_bkt:.1f}s |",
        "",
        f"The bucketed plan joins AND aggregates with zero exchanges",
        "(asserted): bucket metadata satisfies the join's distribution",
        "requirement on both sides and the agg keys on the bucket key, so",
        "the only data movement left is the scan itself. The bucketed",
        "write pays its clustering shuffle once",
        f"({t_write_bkt - t_write_plain:+.1f}s vs plain here); every",
        "subsequent join/agg on the key rides free — on a 1000-executor",
        "cluster that shuffle is the network-bound term, so this is the",
        "canonical trade for fact tables joined repeatedly on one key.",
        "Equality predicates on the bucket key additionally prune to",
        "1/16th of the files (SelectedBucketsCount). Local wall times at",
        "sf0.1 understate the win: in local[32] a shuffle is a memory",
        "copy; on a cluster it is the network.",
        "",
    ]
    text = open("/root/repo/SCALE.md").read()
    marker = "## BUCKETING — measured co-located join (tools/bucket_eval.py)"
    if marker in text:
        text = re.sub(re.escape(marker) + r".*?(?=\n## |\Z)",
                      "\n".join(lines).rstrip() + "\n", text, flags=re.S)
    else:
        text = text.rstrip() + "\n\n" + "\n".join(lines).rstrip() + "\n"
    with open("/root/repo/SCALE.md", "w") as fh:
        fh.write(text)
    print(f"SCALE.md bucketing section written (plain {t_plain:.2f}s/"
          f"{x_plain}x, bucketed {t_bkt:.2f}s/{x_bkt}x, "
          f"write {t_write_plain:.1f}s vs {t_write_bkt:.1f}s)")


if __name__ == "__main__":
    main()
