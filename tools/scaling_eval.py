"""Scale-up evaluation: generate a 10x dataset (key-shifted copies of
lineitem/orders, join-integrity preserved) and measure how query wall time
grows — the direct empirical answer to "would this plan survive a scale-up?"

    python tools/scaling_eval.py          ->  prints table + writes SCALING.md
    python tools/scaling_eval.py --x100   ->  100x run of the worst scalers,
                                              appends the 100x section

AQE stays ON (the scale regime it exists for). Queries that only touch
dimension tables (customer) are included as controls — their ratio ~1 by
construction. The 100x mode (60M lineitem rows) runs the queries whose 10x
ratios were highest — the knee-location measurement the 100 TB story
extrapolates from.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from sanef_election_dashboard_etl_spark.catalog import table
from sanef_election_dashboard_etl_spark.operators import dedup as D
from sanef_election_dashboard_etl_spark.operators import similarity as SIM
from sanef_election_dashboard_etl_spark.operators import text as T
from sanef_election_dashboard_etl_spark.queries import REGISTRY
from sanef_election_dashboard_etl_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1"
SHIFT = 10_000_000

# (query, which side scales) — controls scale nothing
QUERIES = [
    ("p3_filter_conj", "lineitem x10"),
    ("j1b_join_lineitem_orders", "both sides x10"),
    ("a4_sum_two_keys", "lineitem x10"),
    ("q1_pricing_summary", "lineitem x10"),
    ("q6_forecast_revenue", "lineitem x10"),
    ("j4_anti_join", "both sides x10"),
    ("a5_sum_carried_key", "both sides x10"),
    ("o1_full_sort", "lineitem x10"),
    ("pipe_voter_turnout", "both sides x10"),
    ("q3_shipping_priority", "lineitem+orders x10"),
    ("a8_dedup_keep_first", "control (customer only)"),
    ("w2_rank_topk_per_group", "control (customer only)"),
    # LLM-pipeline ops over 10x documents/embeddings (VERDICT r1 #8)
    ("text_quality_score", "documents x10"),
    ("dedup_exact", "documents x10"),
    ("dedup_minhash_lsh", "documents x10"),
    ("sim_topk_lsh", "embeddings corpus x10"),
    ("sim_topk_ivf", "embeddings corpus x10"),
    # round-2 additions (fixed-subset queries like dedup_components or
    # j12_interval_join are deliberately absent: their filters pin the
    # input, so they'd measure nothing)
    ("a16_exact_median", "lineitem x10"),
    ("q7_nation_volume", "all fact sides x10"),
    ("q10_returned_items", "lineitem+orders x10"),
    ("q16_supplier_cnt", "lineitem x10"),
    ("sample_cap_per_source", "documents x10"),
    ("text_top_tokens_per_source", "documents x10"),
    # round-3 additions (pinned-subset entries like pipe_corpus_curation
    # and dedup_components_logn stay out — their doc_id filters fix the
    # input size)
    ("sim_topk_hamming_arrow", "embeddings corpus x10"),
    ("sim_embedding_dup_pairs", "embeddings corpus x10"),
    ("sample_corpus_mixture", "documents x10"),
    # round-4: ExactSubstr-style span dedup (token-salted copies keep
    # dup-span density constant, so this measures pipeline cost)
    ("dedup_substring_stats", "documents x10"),
    ("layout_partition_pruned_scan", "events x10"),
    ("sim_decontaminate", "train corpus x10 (eval side fixed)"),
    ("text_compression_ratio", "documents x10 (UDF tier)"),
    ("pipe_training_data_prep", "documents x10 (4-stage prep chain)"),
    # round-4 late additions: numbering pays its eager range shuffle +
    # count inside fn(), which run() keeps on the clock; fuzzy-edit's
    # twin set is pinned (doc_id<120) but banding covers the full corpus
    ("layout_global_row_number", "lineitem x10"),
    ("snapshot_diff", "documents x10"),
    ("dedup_fuzzy_edit", "documents x10"),
    # round-4 LLM-mixing additions: classifier is explode+one groupBy,
    # epoch_repeat is a narrow explode+filter (expect ~linear & ~flat)
    ("text_quality_classifier", "documents x10"),
    ("sample_epoch_repeat", "documents x10"),
    # context-window chunking: narrow explode, expect ~linear
    ("pack_chunk_documents", "documents x10"),
    # int8 brute force: corpus-linear scoring at 1/4-1/8 the bytes
    ("sim_topk_quantized", "embeddings corpus x10"),
    # round-5 additions: temperature mixing (one tiny agg + narrow
    # filter, expect ~flat), PQ+rerank (codes-linear ADC,
    # shortlist-sized exact rescore); BM25 runs full-table in OPERATORS
    ("sample_temperature_mixture", "documents x10"),
    ("sim_topk_pq", "embeddings corpus x10"),
]

# Operator-level rows (full tables — the registry's simhash entries pin
# doc_id < 300 for oracle cost, which would measure nothing at 10x).
# The expression/arrow pair answers VERDICT r2 #3 directly: the Arrow
# signature stage must beat the tokens x 64 bit-explode as docs grow.
OPERATORS = [
    # r5: BPE apply over the full table (registry pins doc_id < 300);
    # merges trained ONCE outside the timed region would hide the
    # (bounded, sample-sized) train cost, so the lambda times both —
    # the apply dominates as the corpus grows, which is the claim
    ("bpe_tokenize_full", "documents x10 (full table)",
     lambda spark, sf: T.bpe_encode(
         table(spark, sf, "documents"),
         T.bpe_train(table(spark, sf, "documents"), n_merges=100,
                     train_n=512))),
    # r5: BM25 over the full table (registry pins doc_id < 300)
    ("bm25_full_corpus", "documents x10 (full table)",
     lambda spark, sf: T.bm25_topk(
         table(spark, sf, "documents"),
         spark.createDataFrame(
             [("qa", "merge"), ("qa", "window"), ("qa", "scan"),
              ("qb", "stream"), ("qb", "filter"), ("qb", "customer"),
              ("qc", "batch"), ("qc", "slow"), ("qc", "key")],
             "query_id string, term string"), k=10)),
    ("simhash_pairs_expr", "documents x10 (full table)",
     lambda spark, sf: D.simhash_pairs(table(spark, sf, "documents"),
                                       max_hamming=3)),
    ("simhash_pairs_arrow", "documents x10 (full table)",
     lambda spark, sf: D.simhash_pairs_arrow(table(spark, sf, "documents"),
                                             max_hamming=3)),
    # hot-chunk guard A/B: the unguarded registry row measured 3.16x per
    # 10x (duplicate-prefix density makes the candidate join quadratic);
    # max_df=50 drops boilerplate chunk values before the join
    ("fuzzy_edit_guarded", "documents x10 (max_df=50)",
     lambda spark, sf: D.fuzzy_edit_pairs(table(spark, sf, "documents"),
                                          max_df=50)),
    # registry entry pins doc_id<200 for oracle cost; measure the full
    # table here (LM fit + per-lang ntile both scale with the corpus)
    ("ccnet_buckets_full", "documents x10 (full table)",
     lambda spark, sf: T.ccnet_buckets(table(spark, sf, "documents"))),
    # sampled-cutpoint tier on the same full table: the per-lang sort
    # shrinks to the sample, so the gap vs exact should widen with docs
    ("ccnet_sampled_full", "documents x10 (full table)",
     lambda spark, sf: T.ccnet_buckets_sampled(
         table(spark, sf, "documents"), sample_rate=0.1)),
    # DSIR over the full table (registry pins doc_id<200): two LM fits
    # + two scoring joins, all uniform-key — expect ~linear
    ("dsir_full", "documents x10 (full table; target=src0)",
     lambda spark, sf: T.dsir_log_ratio(
         table(spark, sf, "documents"),
         table(spark, sf, "documents").filter(F.col("source") == "src0"))),
]


def generate(spark) -> int:
    l = spark.read.parquet(f"{SRC}/lineitem.parquet")
    o = spark.read.parquet(f"{SRC}/orders.parquet")
    lc = oc = None
    for i in range(10):
        li = l.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * SHIFT))
        oi = o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * SHIFT))
        lc = li if lc is None else lc.unionByName(li)
        oc = oi if oc is None else oc.unionByName(oi)
    lc.repartition(32).write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")
    oc.repartition(8).write.mode("overwrite").parquet(f"{DST}/orders.parquet")
    for t in ("customer", "supplier", "nation", "region", "part"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite") \
            .parquet(f"{DST}/{t}.parquet")
    # events x10: shift event/user ids, keep timestamps — 10x users over the
    # same time range, so per-user session density (what sessionize/funnel
    # cost depends on) is preserved. Read via catalog.table (normalizes the
    # fixture's ts encoding), write back as TIMESTAMP_NTZ to match the
    # fixture parquet encoding for both Spark and the DuckDB oracle.
    ev = table(spark, SRC, "events")
    evc = None
    for i in range(10):
        ei = (ev.withColumn("event_id", F.col("event_id") + F.lit(i * SHIFT))
              .withColumn("user_id", F.col("user_id") + F.lit(i * SHIFT)))
        evc = ei if evc is None else evc.unionByName(ei)
    (evc.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
     .repartition(4).write.mode("overwrite").parquet(f"{DST}/events.parquet"))
    # documents x10: every token salted with the copy index so each copy's
    # shingle space is disjoint — near-dup DENSITY stays constant (the dup
    # groups inside each copy survive; copies don't cross-match), making
    # the 10x row a clean measurement of pipeline cost rather than of a
    # quadratically denser pair problem.
    d = spark.read.parquet(f"{SRC}/documents.parquet")
    dc = None
    for i in range(10):
        di = (d.withColumn("doc_id", F.col("doc_id") + F.lit(i * SHIFT))
              .withColumn("text", F.regexp_replace("text", r"(\S+)",
                                                   f"$1c{i}")))
        dc = di if dc is None else dc.unionByName(di)
    dc.repartition(8).write.mode("overwrite").parquet(f"{DST}/documents.parquet")
    # embeddings x10: corpus grows 10x (vector values reused — ANN cost is
    # rows x dims, independent of the values)
    e = spark.read.parquet(f"{SRC}/embeddings.parquet")
    ec = None
    for i in range(10):
        ei = e.withColumn("vec_id", F.col("vec_id") + F.lit(i * SHIFT))
        ec = ei if ec is None else ec.unionByName(ei)
    ec.repartition(8).write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")
    return spark.read.parquet(f"{DST}/lineitem.parquet").count()


DST100 = "/tmp/sf10"
SHIFT100 = 1_000_000_000

# the 10x table's worst scalers (+ q1 whose r2 bench regression was
# investigated) — the rows worth paying a 60M-row measurement for
X100_QUERIES = [
    ("j1b_join_lineitem_orders", "both sides x100"),
    ("a5_sum_carried_key", "both sides x100"),
    ("j4_anti_join", "both sides x100"),
    ("pipe_voter_turnout", "both sides x100"),
    ("a4_sum_two_keys", "lineitem x100"),
    ("q1_pricing_summary", "lineitem x100"),
    ("dedup_minhash_lsh", "documents x100"),
]


def generate_100x(spark) -> int:
    """100x lineitem/orders/documents via the same key-shift construction
    (copies of sf0.1 with disjoint key/shingle spaces)."""
    l = spark.read.parquet(f"{SRC}/lineitem.parquet")
    o = spark.read.parquet(f"{SRC}/orders.parquet")
    lc = oc = None
    for i in range(100):
        li = l.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * SHIFT100))
        oi = o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * SHIFT100))
        lc = li if lc is None else lc.unionByName(li)
        oc = oi if oc is None else oc.unionByName(oi)
    lc.repartition(64).write.mode("overwrite").parquet(f"{DST100}/lineitem.parquet")
    oc.repartition(16).write.mode("overwrite").parquet(f"{DST100}/orders.parquet")
    for t in ("customer", "supplier", "nation", "region", "part"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite") \
            .parquet(f"{DST100}/{t}.parquet")
    _gen_100x_docs_embeddings(spark)
    return spark.read.parquet(f"{DST100}/lineitem.parquet").count()


def _gen_100x_docs_embeddings(spark) -> None:
    """documents x100 (copy-salted tokens — constant near-dup density, see
    generate()) and embeddings x100 (values reused, disjoint vec_id spaces
    — ANN cost is rows x dims, independent of values). Skips tables already
    materialized at the right row count so the heavy-op mode can reuse a
    prior --x100 run's output."""
    d0 = spark.read.parquet(f"{SRC}/documents.parquet")
    try:
        have = spark.read.parquet(f"{DST100}/documents.parquet").count()
    except Exception:
        have = 0
    if have != d0.count() * 100:
        dc = None
        for i in range(100):
            di = (d0.withColumn("doc_id", F.col("doc_id") + F.lit(i * SHIFT100))
                  .withColumn("text", F.regexp_replace("text", r"(\S+)",
                                                       f"$1c{i}")))
            dc = di if dc is None else dc.unionByName(di)
        dc.repartition(32).write.mode("overwrite") \
            .parquet(f"{DST100}/documents.parquet")
    e0 = spark.read.parquet(f"{SRC}/embeddings.parquet")
    try:
        have = spark.read.parquet(f"{DST100}/embeddings.parquet").count()
    except Exception:
        have = 0
    if have != e0.count() * 100:
        # Per-copy deterministic sign flips (an orthogonal transform):
        # within-copy inner products are exactly preserved (every vector in
        # copy i gets the SAME flip pattern), cross-copy cosine of the same
        # source vector drops to ~sum(+-v_j^2)/|v|^2 ~ 0 — so dup DENSITY
        # stays constant (each vector near-matches only its in-query clone,
        # never its 99 siblings) and the x100 row measures pipeline cost,
        # not a quadratically denser pair problem. Mirrors the documents
        # copy-salt trick in vector space.
        ec = None
        for i in range(100):
            flip = F.transform(
                F.col("embedding"),
                lambda x, j: x * F.when(
                    F.pmod(F.hash(F.lit(i), j), F.lit(2)) == 0,
                    F.lit(1.0)).otherwise(F.lit(-1.0)))
            ei = (e0.withColumn("vec_id", F.col("vec_id") + F.lit(i * SHIFT100))
                  .withColumn("embedding", flip.cast("array<float>")))
            ec = ei if ec is None else ec.unionByName(ei)
        ec.repartition(16).write.mode("overwrite") \
            .parquet(f"{DST100}/embeddings.parquet")


def main_100x() -> None:
    spark = get_spark("scaling-eval-100x")
    spark.sparkContext.setLogLevel("ERROR")
    n = generate_100x(spark)
    print(f"100x dataset ready: {n} lineitem rows at {DST100}")

    def run(sf_dir: str, name: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        return time.perf_counter() - t0

    for name, _ in X100_QUERIES:
        run(SRC, name)                    # warm plans
    lines = [
        "",
        "## 100x (60M lineitem rows — the knee-location run)",
        "",
        "Same construction at 100 copies; worst 10x scalers only.",
        "`x/10x-ratio` answers: did cost stay linear-or-better over the",
        "SECOND order of magnitude (10x -> 100x should be ~<=10x time if",
        "the 10x ratio already amortized fixed overheads)?",
        "",
        "| query | scaled input | sf0.1 | 100x data | time ratio | per-10x |",
        "|---|---|---|---|---|---|",
    ]
    for name, what in X100_QUERIES:
        ts = min(run(SRC, name), run(SRC, name))
        tb = min(run(DST100, name), run(DST100, name))
        r = tb / ts
        lines.append(f"| {name} | {what} | {ts:.2f}s | {tb:.2f}s | "
                     f"{r:.1f}x | {r / 10:.2f}x |")
        print(f"{name:28s} {ts:6.3f}s -> {tb:6.3f}s  ({r:.1f}x, "
              f"{r / 10:.2f}x per 10x)  [{what}]")
    lines += [
        "",
        "Reading: split decades before judging — the sf0.1 -> 10x decade",
        "pays overhead amortization; the 10x -> 100x decade (divide this",
        "table's time by the 10x table's) is the honest scaling signal.",
        "A second-decade per-10x well above 1 marks a knee the 100 TB",
        "deployment must partition around.",
    ]
    with open("/root/repo/SCALING.md", "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("SCALING.md 100x section appended")


# VERDICT r3 #4: the expensive ANN/dedup ops, measured over the SECOND
# order of magnitude. Corpus constructions that keep dup/neighbor density
# constant (sign-flipped embedding copies, salted document tokens) so each
# row is a pipeline-cost measurement, not a denser-problem measurement.
X100_HEAVY = [
    ("sim_topk_hamming_arrow", "embeddings corpus x100 (200k vecs)"),
    ("sim_embedding_dup_pairs", "embeddings corpus x100 (400k in-query)"),
    ("sim_topk_ivf", "embeddings corpus x100 (200k vecs)"),
    # r4: ExactSubstr span dedup — token-salted copies keep dup-span
    # density constant, so the row measures the gram/window pipeline
    ("dedup_substring_stats", "documents x100 (500k docs)"),
    # r4 session-4: int8 brute force must stay corpus-linear (it scores
    # everything — the bet is bytes, not candidates)
    ("sim_topk_quantized", "embeddings corpus x100 (200k vecs)"),
    # chunking is a narrow explode — the control-shaped heavy row (its
    # output is ~2x corpus rows, so exec measures explode throughput)
    ("pack_chunk_documents", "documents x100 (500k docs)"),
    # r5: PQ + rerank — ADC must stay codes-linear and the rerank scan
    # shortlist-sized (the exact read is rerank*k*n_queries rows at any
    # corpus size; build phase = sample fit + encode pass)
    ("sim_topk_pq", "embeddings corpus x100 (200k vecs)"),
]

def _semantic_dedup_scaled(spark, sf):
    """semantic_dedup at eval scale: clones shifted into a gap no 100x
    copy occupies; plane count re-derived from the corpus size (the
    documented scale mechanism — cluster count tracks N so per-cluster
    quadratic cost stays ~constant)."""
    from sanef_election_dashboard_etl_spark.operators.similarity import (
        auto_n_planes, semantic_dedup)
    emb = table(spark, sf, "embeddings")
    u = emb.unionByName(
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(500_000)))
    return semantic_dedup(u, n_planes=auto_n_planes(u.count()))


def _bloom_incremental_scaled(spark, sf):
    """Bloom incremental dedup at eval scale: per-copy 70/30 corpus/batch
    split (pmod keeps the split aligned across the 100 id-shifted
    copies); m sized for the 100x corpus (350k keys x ~12 bits) and held
    constant across scales so the ratio measures data growth only."""
    docs = table(spark, sf, "documents")
    part = F.pmod(F.col("doc_id"), F.lit(SHIFT100))
    return D.incremental_dedup_bloom(docs.filter(part < 3500),
                                     docs.filter(part >= 3500),
                                     m_bits=1 << 22)


def _pagerank_scaled(spark, sf):
    """PageRank iteration cost at corpus scale: a deterministic 2-edges-
    per-node graph derived from doc ids (successor chain + a stride-37
    long-range edge), 3 Pregel iterations. Measures the edge-join +
    dest-groupBy pipeline the operator repeats per iteration; the
    .count() for the modulus is a visible build-phase job."""
    docs = table(spark, sf, "documents").select("doc_id")
    n = docs.count()
    ring = docs.select(F.col("doc_id").alias("id_a"),
                       F.pmod(F.col("doc_id") + 1, F.lit(n)).alias("id_b"))
    far = docs.select(F.col("doc_id").alias("id_a"),
                      F.pmod(F.col("doc_id") * 37 + 11,
                             F.lit(n)).alias("id_b"))
    edges = ring.unionByName(far).filter(F.col("id_a") != F.col("id_b"))
    return D.pagerank(edges, n_iter=3)


_RRF_QTERMS = [("qa", "merge"), ("qa", "window"), ("qa", "scan"),
               ("qb", "stream"), ("qb", "filter"), ("qb", "customer"),
               ("qc", "batch"), ("qc", "slow"), ("qc", "key")]


def _hybrid_rrf_scaled(spark, sf):
    """The full hybrid retrieval path at corpus scale: BM25 over every
    document + exact cosine over every embedding, fused by RRF. The
    fusion stage itself is |queries| x k x 2 rows at ANY corpus size —
    the row should track the two retrievers' own linear scans."""
    docs = table(spark, sf, "documents")
    emb = table(spark, sf, "embeddings")
    qt = spark.createDataFrame(_RRF_QTERMS, "query_id string, term string")
    lex = (T.bm25_topk(docs, qt, k=20)
           .select("query_id", "rank", "doc_id"))
    dense = (SIM.cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=20)
             .select(F.when(F.col("query_id") == 0, "qa")
                      .when(F.col("query_id") == 1, "qb")
                      .otherwise("qc").alias("query_id"),
                     "rank", F.col("neighbor_id").alias("doc_id")))
    return SIM.rrf_fuse([lex, dense], k=10)



X100_HEAVY_OPERATORS = [
    ("simhash_pairs_arrow", "documents x100 (500k docs, full table)",
     lambda spark, sf: D.simhash_pairs_arrow(table(spark, sf, "documents"),
                                             max_hamming=3)),
    # r5: the hot-band guard (max_df) is the fix for the unguarded row's
    # decade-2 superlinearity — candidate pairs are quadratic without it
    # (fixed 2^16 band key space; see tools/candidate_density.py and the
    # SCALING.md candidate-density section)
    ("simhash_guarded", "documents x100 (500k docs, max_df=50)",
     lambda spark, sf: D.simhash_pairs_arrow(table(spark, sf, "documents"),
                                             max_hamming=3, max_df=50)),
    # r5: the 128-bit wide tier auto_simhash_bits selects above ~200k
    # docs — 2^16 fewer uniform band collisions; candidates measured 73x
    # below the 64-bit tier at 100x (SCALING.md candidate-density)
    ("simhash_wide", "documents x100 (500k docs, 128-bit)",
     lambda spark, sf: D.simhash_pairs_wide(table(spark, sf, "documents"),
                                            max_hamming=3)),
    ("semantic_dedup", "embeddings x100 + clones (400k in-query; "
     "auto planes 6->13)", _semantic_dedup_scaled),
    ("incremental_dedup_bloom", "documents x100 (350k corpus / 150k batch)",
     _bloom_incremental_scaled),
    # guarded fuzzy-edit at decade two: the max_df cap is the claim that
    # the candidate join stays corpus-linear when hot-chunk density
    # would otherwise grow the sum(df^2) bound quadratically
    ("fuzzy_edit_guarded", "documents x100 (500k docs, max_df=50)",
     lambda spark, sf: D.fuzzy_edit_pairs(table(spark, sf, "documents"),
                                          max_df=50)),
    # r5: BM25 over the FULL document table (the registry entry pins
    # doc_id < 300 for oracle cost) — the inverted-index aggs must stay
    # corpus-linear while the df/LUT side stays query-terms-sized
    # r5 session-2: per-source TOKEN budget — the cost claim is "one
    # group exchange + per-source running-sum window"; the row measures
    # the per-source sort at 100x rows (few sources, so each source's
    # partition carries ~N/5 rows: the documented exact-tier bound)
    ("token_budget_cap", "documents x100 (500k docs, 5 sources)",
     lambda spark, sf: __import__(
         "sanef_election_dashboard_etl_spark.operators.sampling",
         fromlist=["token_budget_cap"]).token_budget_cap(
             table(spark, sf, "documents"), budget_tokens=100_000)),
    # r5 session-2: PageRank (3 iterations) over a 2-edge-per-node graph
    # derived from doc ids — per-iteration edge join + dest groupBy must
    # stay edge-linear
    ("pagerank_3iter", "documents x100 (500k nodes / 1M edges)",
     _pagerank_scaled),
    # r5 session-2: the whole hybrid retrieval path (BM25 + dense +
    # RRF); fusion is corpus-size-independent so this tracks the two
    # retriever scans
    ("hybrid_rrf_full", "docs+embeddings x100 (500k docs / 200k vecs)",
     _hybrid_rrf_scaled),
    # r5 session-3: hard-negative mining — anchors fixed (10), corpus
    # x100: the scan must stay corpus-linear like the other broadcast-
    # query exact tiers (label filter is a join predicate, not a pass)
    ("hard_negatives", "embeddings corpus x100 (200k vecs, 10 anchors)",
     lambda spark, sf: SIM.hard_negatives(
         table(spark, sf, "embeddings"),
         table(spark, sf, "embeddings").filter(F.col("vec_id") < 10), k=5)),
    # r5 session-3: MMR — stage 1 is the corpus-linear shortlist scan;
    # every unrolled greedy stage reads the persisted |q| x pool tables,
    # so the ratio should track the scan alone
    ("mmr_rerank", "embeddings corpus x100 (200k vecs, 8 queries)",
     lambda spark, sf: SIM.mmr_rerank(
         table(spark, sf, "embeddings"),
         table(spark, sf, "embeddings").filter(F.col("vec_id") < 8),
         k=4, pool=12)),
    # r5 session-3: data card — one narrow projection + two metadata-
    # sized aggs; the control-shaped observability row
    ("data_card", "documents x100 (500k docs)",
     lambda spark, sf: __import__(
         "sanef_election_dashboard_etl_spark.operators.profile",
         fromlist=["data_card"]).data_card(table(spark, sf, "documents"))),
    # r5 session-3: soft dedup — one window count on the digest + a
    # narrow integer filter; must track the fingerprint scan
    ("dedup_weighted_sample", "documents x100 (500k docs)",
     lambda spark, sf: __import__(
         "sanef_election_dashboard_etl_spark.operators.sampling",
         fromlist=["dedup_weighted_sample"]).dedup_weighted_sample(
             table(spark, sf, "documents").withColumn(
                 "fp", T.fingerprint(F.col("text"))), "fp")),
    # r5 session-3: native Lloyd's — per round ONE broadcast scoring
    # pass (k rows) + one posexplode mean agg; must stay corpus-linear
    # across the fixed 2-round unroll
    ("kmeans_spherical", "embeddings corpus x100 (200k vecs, k=4)",
     lambda spark, sf: SIM.kmeans_spherical(
         table(spark, sf, "embeddings"), k=4, n_iter=2)),
    ("bm25_full_corpus", "documents x100 (500k docs, 9-term queries)",
     lambda spark, sf: T.bm25_topk(
         table(spark, sf, "documents"),
         spark.createDataFrame(
             [("qa", "merge"), ("qa", "window"), ("qa", "scan"),
              ("qb", "stream"), ("qb", "filter"), ("qb", "customer"),
              ("qc", "batch"), ("qc", "slow"), ("qc", "key")],
             "query_id string, term string"), k=10)),
]


def _chain_edges(spark, n_chains: int, depth: int):
    """n_chains disjoint path graphs of `depth` nodes — the adversarial
    deep-diameter input for connected components (near-dup chains from
    e.g. iterative re-crawls/re-encodes). Ids spaced so chains never
    collide."""
    base = spark.range(n_chains * depth).select(
        (F.col("id") / depth).cast("long").alias("c"),
        F.pmod(F.col("id"), F.lit(depth)).alias("j"))
    return (base.filter(F.col("j") < depth - 1)
            .select((F.col("c") * 1_000_000 + F.col("j")).alias("id_a"),
                    (F.col("c") * 1_000_000 + F.col("j") + 1).alias("id_b")))


def main_100x_heavy() -> None:
    spark = get_spark("scaling-eval-100x-heavy")
    spark.sparkContext.setLogLevel("ERROR")
    _gen_100x_docs_embeddings(spark)
    print("100x documents/embeddings ready at", DST100)

    def run(sf_dir: str, fn) -> tuple[float, float]:
        """(build, exec): build = DataFrame construction — Catalyst
        compile PLUS any eager build-phase jobs the operator runs
        (KMeans fit, bloom word-fold, dim probe). exec = min of 2 timed
        noop writes of the built plan. Split because compile is a
        data-INDEPENDENT constant (measured ~8s for the 120-plane
        hamming expressions at ANY scale) that, timed inline, flatters
        the scale ratio; build-phase jobs however are data-dependent
        and must stay visible (bloom build IS the corpus pass)."""
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()   # warm exec
        execs = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            execs.append(time.perf_counter() - t0)
        return t_build, min(execs)

    lines = [
        "",
        "### Heavy ANN/dedup ops at 100x (`--x100-heavy`)",
        "",
        "Same decade-two question for the expensive LLM-pipeline ops.",
        "Embedding copies are sign-flipped per copy (orthogonal transform:",
        "within-copy geometry exact, cross-copy cosine ~0) and document",
        "tokens copy-salted, so neighbor/dup density is constant and each",
        "row measures pipeline cost at 100x rows, not a denser problem.",
        "`build` = plan compile + eager build-phase jobs (KMeans fit,",
        "bloom word-fold); `exec` = steady-state run of the built plan.",
        "Compile is a data-independent constant (it reached ~8-11s for",
        "the naive per-plane signature construction before the r4",
        "SQL-parsed-literal fix, similarity.lsh_bucket; sub-second now),",
        "so the scaling verdict reads on exec, with build shown so",
        "data-dependent build phases (bloom word-fold, KMeans fit) stay",
        "honest — note bloom's build growing with the corpus.",
        "",
        "| query | scaled input | sf0.1 build/exec | 100x build/exec "
        "| exec ratio | per-10x |",
        "|---|---|---|---|---|---|",
    ]
    jobs = [(n, w, REGISTRY[n].fn) for n, w in X100_HEAVY] + \
        [(n, w, fn) for n, w, fn in X100_HEAVY_OPERATORS]
    for name, _, fn in jobs:
        run(SRC, fn)                      # warm workers + caches
    for name, what, fn in jobs:
        bs, ts = run(SRC, fn)
        bb, tb = run(DST100, fn)
        r = tb / ts
        lines.append(f"| {name} | {what} | {bs:.2f}s / {ts:.2f}s | "
                     f"{bb:.2f}s / {tb:.2f}s | {r:.1f}x | {r / 10:.2f}x |")
        print(f"{name:28s} build {bs:5.2f}s exec {ts:6.3f}s -> "
              f"build {bb:5.2f}s exec {tb:6.3f}s  ({r:.1f}x, "
              f"{r / 10:.2f}x per 10x)  [{what}]")

    # connected components on 100-deep chains: the round-count claim
    # (O(log n) vs O(diameter)) measured, not asserted.
    n_chains, depth = 2000, 100
    edges = _chain_edges(spark, n_chains, depth).localCheckpoint(eager=True)
    n_edges = edges.count()
    t0 = time.perf_counter()
    got = (D.connected_components_logn(edges, max_iter=40)
           .select("component").distinct().count())
    t_logn = time.perf_counter() - t0
    r_logn = D.connected_components_logn.last_rounds
    assert got == n_chains, f"logn components wrong: {got} != {n_chains}"
    t0 = time.perf_counter()
    got = (D.connected_components(edges, max_iter=200)
           .select("component").distinct().count())
    t_min = time.perf_counter() - t0
    r_min = D.connected_components.last_rounds
    assert got == n_chains, f"min-label components wrong: {got} != {n_chains}"
    lines += [
        "",
        f"**Connected components, {n_chains} disjoint {depth}-deep chains**",
        f"({n_edges} edges — diameter {depth - 1}, the worst case for",
        "label propagation):",
        "",
        "| algorithm | rounds | wall |",
        "|---|---|---|",
        f"| min-label (O(diameter)) | {r_min} | {t_min:.1f}s |",
        f"| large-star/small-star (O(log n)) | {r_logn} | {t_logn:.1f}s |",
        "",
        "Both converge to the identical component set (asserted in the",
        "harness). The star algorithm's round count is what survives a",
        "100 TB corpus whose dup chains are deep; per-round shuffle shape",
        "is the same for both (uniform vertex keys).",
    ]
    # Idempotent AND tail-preserving (r5: a refresh previously truncated
    # to EOF and silently deleted hand-written sections appended after
    # the heavy table): replace exactly the region between the section
    # header and the end sentinel, keeping everything after it.
    sentinel = "<!-- end x100-heavy -->"
    lines.append(sentinel)
    with open("/root/repo/SCALING.md") as fh:
        doc = fh.read()
    cut = doc.find("### Heavy ANN/dedup ops at 100x")
    tail = ""
    if cut != -1:
        end = doc.find(sentinel, cut)
        if end != -1:
            tail = doc[end + len(sentinel):]
        doc = doc[:cut].rstrip() + "\n"
    with open("/root/repo/SCALING.md", "w") as fh:
        fh.write(doc + "\n".join(lines) + "\n" + tail)
    print("SCALING.md heavy-100x section refreshed "
          f"(components: min-label {r_min} rounds {t_min:.1f}s, "
          f"log-n {r_logn} rounds {t_logn:.1f}s)")


def main() -> None:
    spark = get_spark("scaling-eval")
    spark.sparkContext.setLogLevel("ERROR")
    n = generate(spark)
    print(f"10x dataset ready: {n} lineitem rows at {DST}")

    def run(sf_dir: str, name: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        return time.perf_counter() - t0

    def run_op(sf_dir: str, fn) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name, _ in QUERIES:          # warm both plans AND both page
        run(SRC, name)               # caches: generate() just rewrote
        run(DST, name)               # DST, so an unwarmed DST cell
    for _, _, fn in OPERATORS:       # times a cold 10x read (caught
        run_op(SRC, fn)              # r6: training_prep read 3.06x
        run_op(DST, fn)              # cold vs 1.66x warm)

    lines = [
        "# SCALING — measured 10x scale-up behavior",
        "",
        f"Generated by `tools/scaling_eval.py`: lineitem/orders duplicated 10x",
        "with shifted keys (6M lineitem rows, join integrity preserved);",
        "documents duplicated 10x with copy-salted tokens (disjoint shingle",
        "spaces -> near-dup density constant, so the dedup rows measure",
        "pipeline cost, not a denser pair problem); embeddings corpus 10x with",
        "fixed query sets. AQE ON, best-of-2 per cell, local[32]. The question",
        "each row answers: does the plan's cost grow with the data (bad:",
        "superlinear) or below it (good: fixed overhead amortizing, cores",
        "absorbing rows)?",
        "",
        "Timing note: these base tables time DataFrame construction +",
        "execution together; after the r4 parsed-literal fix",
        "(similarity.lsh_bucket) construction is a <=1s constant for every",
        "row here, so the ratios read on data cost. The heavy-op table at",
        "the bottom still splits build from exec explicitly, because its",
        "build phases contain data-DEPENDENT jobs (bloom word-fold, KMeans",
        "fit) worth seeing separately.",
        "",
        "| query | scaled input | sf0.1 | 10x data | time ratio |",
        "|---|---|---|---|---|",
    ]
    ratios = []
    for name, what in QUERIES:
        ts = min(run(SRC, name), run(SRC, name))
        tb = min(run(DST, name), run(DST, name))
        r = tb / ts
        if "control" not in what:
            ratios.append(r)
        lines.append(f"| {name} | {what} | {ts:.2f}s | {tb:.2f}s | {r:.2f}x |")
        print(f"{name:28s} {ts:6.3f}s -> {tb:6.3f}s  ({r:.2f}x)  [{what}]")
    for name, what, fn in OPERATORS:
        ts = min(run_op(SRC, fn), run_op(SRC, fn))
        tb = min(run_op(DST, fn), run_op(DST, fn))
        r = tb / ts
        lines.append(f"| {name} | {what} | {ts:.2f}s | {tb:.2f}s | {r:.2f}x |")
        print(f"{name:28s} {ts:6.3f}s -> {tb:6.3f}s  ({r:.2f}x)  [{what}]")
    mean = sum(ratios) / len(ratios)
    lines += [
        "",
        f"Mean time ratio over the scaled queries: **{mean:.2f}x for 10x the",
        "data** — well under linear. At sf0.1 the fixed per-query overhead",
        "(job launch, stage scheduling) dominates; at 10x the cores are",
        "actually busy and throughput per core rises. Controls (dimension-only",
        "queries) sit at ~1x as expected. Extrapolating the same plans to a",
        "cluster: cost grows with rows scanned/shuffled per core, and every",
        "plan here shuffles only keys/aggregates, never unpruned tables.",
        "",
        "The simhash expr/arrow pair (full documents table, identical",
        "output — test-asserted) measures the VERDICT-flagged tokens x 64",
        "bit-explode against the Arrow signature stage: the arrow form",
        "feeds ONE row per doc into the banding join instead of",
        "tokens x 64 vote rows into the partial agg, and the gap widens",
        "with document count/length.",
        "",
        "The fuzzy-edit pair (registry exact vs max_df=50 guarded) is the",
        "hot-chunk story: the candidate-join bound sum(df^2) over chunk",
        "values measured 40k at sf0.1 -> 1.1M at 10x (28x per 10x — the",
        "word-salad corpus repeats 11-char chunk values across DISTINCT",
        "keys), so unguarded wall time goes superlinear as verification",
        "starts to dominate; the broadcast anti-join guard holds absolute",
        "time ~30% lower at both scales and caps the quadratic term at",
        "max_df^2 per chunk value regardless of corpus size — the knob a",
        "100 TB run must set (recall trade documented in",
        "dedup.fuzzy_edit_pairs).",
    ]
    # keep a previously-measured 100x section (written by --x100) intact
    tail = ""
    try:
        old = open("/root/repo/SCALING.md").read()
        if "\n## 100x" in old:
            tail = "\n" + old[old.index("\n## 100x") + 1:]
    except OSError:
        pass
    with open("/root/repo/SCALING.md", "w") as fh:
        fh.write("\n".join(lines) + "\n" + tail)
    print(f"\nmean scaled ratio {mean:.2f}x; SCALING.md written")


if __name__ == "__main__":
    if "--x100-heavy" in sys.argv:
        main_100x_heavy()
    elif "--x100" in sys.argv:
        main_100x()
    else:
        main()
