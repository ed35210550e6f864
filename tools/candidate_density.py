"""Candidate-pair density probe for the banded dedup ops (VERDICT r4
next-round item 3): measures, at 1x/10x/100x documents, how many
candidate pairs each banding stage generates BEFORE verification —
the quantity that decides whether the decade-2 superlinear wall-time
rows (simhash_pairs_arrow 1.23x/10x, fuzzy_edit_guarded 1.33x/10x in
SCALING.md) are a plan defect or candidate density.

    python tools/candidate_density.py          -> prints table, appends SCALING.md

For each scale it reports:
- simhash: bucket-sum C(df,2) over the 4 x 16-bit (chunk, cval) bands
  (pre-distinct candidate join output) and the verified pair count.
  The 16-bit band key space is FIXED (65,536 values per chunk), so
  uniform random collisions grow ~ 4 * C(n,2) / 2^16 — quadratic in
  corpus size regardless of plan quality.
- fuzzy-edit: kept-index entries, dropped hot chunks, pre-distinct
  candidate rows (sum over (ci,cv) of probe_df * index_df), distinct
  candidate pairs, and verified pairs under max_df=50.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from sanef_election_dashboard_etl_spark.operators import dedup as D
from sanef_election_dashboard_etl_spark.session import get_spark

SCALES = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", "/tmp/sf1"),
    ("100x", "/tmp/sf10"),
]


def simhash_stats(spark, sf_dir: str) -> dict:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    sig = D.simhash_signature_arrow(docs, n_bits=64)
    chunks = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.expr(f"(simhash >> {16 * c}) & 65535").alias("cval"))
            for c in range(4)])).alias("b")) \
        .select("doc_id", "b.chunk", "b.cval")
    # candidate join size = sum over buckets of C(df, 2)
    per_bucket = chunks.groupBy("chunk", "cval").agg(
        F.count(F.lit(1)).alias("df"))
    cand = per_bucket.agg(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).cast("long")
        .alias("cand")).collect()[0]["cand"]
    t0 = time.perf_counter()
    verified = D.simhash_pairs_arrow(docs, max_hamming=3).count()
    wall = time.perf_counter() - t0
    # uniform-collision expectation with a FIXED 16-bit band key space
    expect_uniform = int(4 * n * (n - 1) / 2 / 65536)
    return {"docs": n, "cand_pairs": int(cand), "verified": verified,
            "uniform_floor": expect_uniform, "wall": round(wall, 2)}


def fuzzy_stats(spark, sf_dir: str, max_df: int = 50) -> dict:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    # replicate fuzzy_edit_pairs' candidate stage (dedup.py) for counting
    key_len, n_chunks, max_edits = 64, 4, 2
    w = key_len // n_chunks
    keyed = (docs.filter(F.length("text") >= key_len)
             .select(F.col("doc_id").alias("__id"),
                     F.substring("text", 1, key_len).alias("__key")))
    probes = keyed.select(
        "__id",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("ci"),
                     F.substring("__key", 1 + w * i, w).alias("cv"))
            for i in range(n_chunks)])).alias("c")) \
        .select("__id", "c.ci", "c.cv")
    windows = []
    for i in range(n_chunks):
        for d in range(-max_edits, max_edits + 1):
            pos = 1 + w * i + d
            if 1 <= pos <= key_len - w + 1:
                windows.append(
                    F.struct(F.lit(i).alias("ci"),
                             F.substring("__key", pos, w).alias("cv")))
    index = keyed.select(
        F.col("__id").alias("__idb"),
        F.explode(F.array(*windows)).alias("c")) \
        .select("__idb", "c.ci", "c.cv")
    hot = (index.groupBy("ci", "cv")
           .agg(F.count(F.lit(1)).alias("__df"))
           .filter(F.col("__df") > max_df).select("ci", "cv"))
    n_hot = hot.count()
    probes_k = probes.join(F.broadcast(hot), ["ci", "cv"], "left_anti")
    index_k = index.join(F.broadcast(hot), ["ci", "cv"], "left_anti")
    kept_index = index_k.count()
    # pre-distinct candidate rows = sum over keys of probe_df * index_df
    pd_ = (probes_k.groupBy("ci", "cv").agg(F.count(F.lit(1)).alias("pdf"))
           .join(index_k.groupBy("ci", "cv")
                 .agg(F.count(F.lit(1)).alias("idf")), ["ci", "cv"])
           .agg(F.sum(F.col("pdf") * F.col("idf")).alias("s"))
           .collect()[0]["s"])
    distinct_cand = (probes_k.join(index_k, ["ci", "cv"])
                     .filter(F.col("__id") < F.col("__idb"))
                     .select("__id", "__idb").distinct().count())
    t0 = time.perf_counter()
    verified = D.fuzzy_edit_pairs(docs, max_df=max_df).count()
    wall = time.perf_counter() - t0
    return {"docs": n, "hot_chunks_dropped": n_hot,
            "kept_index_entries": kept_index,
            "cand_rows_pre_distinct": int(pd_ or 0),
            "cand_pairs_distinct": distinct_cand,
            "verified": verified, "wall": round(wall, 2)}


def main() -> None:
    spark = get_spark("cand-density")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {"simhash": {}, "fuzzy": {}}
    for label, sf in SCALES:
        out["simhash"][label] = simhash_stats(spark, sf)
        print(f"simhash {label}: {out['simhash'][label]}", flush=True)
    for label, sf in SCALES:
        out["fuzzy"][label] = fuzzy_stats(spark, sf)
        print(f"fuzzy   {label}: {out['fuzzy'][label]}", flush=True)
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
