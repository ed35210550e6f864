"""Skew-join evaluation: measure a sort-merge join under synthetic zipfian
key skew, three ways — plain (AQE off: the straggler case), AQE skew-split
(session default), and `relational.salted_join` (the explicit guard for
non-AQE contexts / known-ahead skew).

    python tools/skew_eval.py [n_rows] [hot_frac]  ->  prints table +
    writes the SKEW section of SCALE.md

Dataset: `n_rows` fact rows over 10k keys where `hot_frac` of all rows
land on ONE key (the 100 TB failure mode: a null-ish default, a
boilerplate shingle, an empty-string join key), joined to a 10k-row dim.
Sort-merge is forced (broadcast threshold -1) because skew only bites
when the join actually shuffles — at 100 TB the dim side of a real skewed
join is too big to broadcast.
"""

from __future__ import annotations

import json
import re
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from sanef_election_dashboard_etl_spark.operators.relational import salted_join


def build(spark: SparkSession, n_rows: int, hot_frac: float):
    """Fact: n_rows rows, `hot_frac` on key 0, rest uniform over 1..9999.
    Dim: one row per key. Both materialized (cached + counted) so the
    measured time is the join, not the generator."""
    n_hot = int(n_rows * hot_frac)
    fact = (spark.range(n_rows)
            .select(F.when(F.col("id") < n_hot, F.lit(0))
                     .otherwise(F.pmod(F.xxhash64("id"), F.lit(9999)) + 1)
                     .alias("k"),
                    (F.col("id") % 1000).alias("v")))
    dim = spark.range(10_000).select(F.col("id").alias("k"),
                                     (F.col("id") * 7).alias("w"))
    fact = fact.repartition(32).persist()
    dim = dim.persist()
    fact.count(), dim.count()
    return fact, dim


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.7
    spark = (SparkSession.builder.master("local[8]")
             .appName("skew-eval")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.autoBroadcastJoinThreshold", "-1")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    fact, dim = build(spark, n_rows, hot_frac)

    def agg_count(df) -> None:
        # aggregate AFTER the join so the join's full output is produced
        # but nothing is collected
        df.agg(F.count(F.lit(1)), F.sum("w")).collect()

    def set_aqe(on: bool) -> None:
        spark.conf.set("spark.sql.adaptive.enabled", str(on).lower())
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(on).lower())
        # let AQE split aggressively at micro-benchmark sizes
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8MB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                       "8MB")

    # warm the JVM paths once off the clock
    set_aqe(False)
    agg_count(fact.limit(1000).join(dim, "k"))

    results: dict[str, float] = {}
    set_aqe(False)
    results["plain SMJ, AQE off (straggler)"] = timed(
        lambda: agg_count(fact.join(dim, "k")))
    results["salted_join (16 buckets), AQE off"] = timed(
        lambda: agg_count(salted_join(fact, dim, "k", salt_buckets=16)))
    set_aqe(True)
    results["plain SMJ, AQE skew-split on"] = timed(
        lambda: agg_count(fact.join(dim, "k")))

    print(json.dumps({"n_rows": n_rows, "hot_frac": hot_frac,
                      **{k: round(v, 2) for k, v in results.items()}}))

    hot_pct = int(hot_frac * 100)
    lines = [
        "## SKEW — measured (tools/skew_eval.py)",
        "",
        f"Synthetic zipf join: {n_rows / 1e6:.0f}M fact rows over 10k keys,",
        f"{hot_pct}% of rows on ONE key, sort-merge forced (broadcast off,",
        "as at 100 TB where the dim side no longer broadcasts), local[8].",
        "",
        "| strategy | wall time |",
        "|---|---|",
    ]
    for name, secs in results.items():
        lines.append(f"| {name} | {secs:.2f} s |")
    base = results["plain SMJ, AQE off (straggler)"]
    salted = results["salted_join (16 buckets), AQE off"]
    aqe = results["plain SMJ, AQE skew-split on"]
    lines += [
        "",
        f"Reading: one hot key serializes {hot_pct}% of the probe side into",
        f"a single reducer task — the straggler bound. `salted_join` spreads",
        f"it over 16 salt buckets ({base / salted:.1f}x), AQE's runtime",
        f"skew-split gets {base / aqe:.1f}x with zero query changes (session",
        "default). At cluster scale the gap widens linearly with hot-key",
        "share; the salted path exists for non-AQE contexts and for",
        "known-skew pipelines where exploding the dim side x16 is cheaper",
        "than a runtime re-plan. Local-mode caveat: all 8 threads share",
        "one JVM's memory bandwidth, which flatters the straggler — on a",
        "real cluster the hot task is additionally network- and",
        "spill-bound, so these ratios are a floor.",
        "",
    ]
    text = open("/root/repo/SCALE.md").read()
    marker_start = "## SKEW — measured (tools/skew_eval.py)"
    if marker_start in text:
        # replace the existing section (ends at the next '## ' or EOF)
        pattern = re.escape(marker_start) + r".*?(?=\n## |\Z)"
        text = re.sub(pattern, "\n".join(lines).rstrip() + "\n", text,
                      flags=re.S)
    else:
        text = text.rstrip() + "\n\n" + "\n".join(lines).rstrip() + "\n"
    with open("/root/repo/SCALE.md", "w") as fh:
        fh.write(text)
    print("SCALE.md skew section written")


if __name__ == "__main__":
    main()
