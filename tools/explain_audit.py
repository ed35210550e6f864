"""Physical-plan audit: regenerates PLANS.md with the executed plans of the
headline queries and asserts the plan properties SCALE.md claims
(pushdown reaches the scan, dims broadcast, top-k limits push down, no
cartesian products outside the similarity baselines).

    python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from sanef_election_dashboard_etl_spark.queries import REGISTRY
from sanef_election_dashboard_etl_spark.session import get_spark

# query -> substrings that MUST appear in its executed plan
MUST_HAVE = {
    "p3_filter_conj": ["PushedFilters: [", "LessThan(l_quantity",
                       "GreaterThan(l_discount"],
    "s1_scan_project": ["ReadSchema: struct<n_nationkey:int,n_name:string,"
                        "n_regionkey:int>"],
    "j1_dim_join": ["BroadcastHashJoin"],
    "j2_three_table": ["BroadcastHashJoin"],
    # one-exchange shape (VERDICT r5 item 4): lineitem repartitions once
    # on the join key; the pair-agg, key dedup, and anti-join right side
    # all ride it (shuffled-hash anti, no 399k-key driver broadcast)
    "j4_anti_join": ["LeftAnti", "ShuffledHashJoin",
                     "Exchange hashpartitioning(l_orderkey"],
    "j7_deloop_semi": ["LeftSemi"],
    "o1_o3_topk_sort": ["TakeOrderedAndProject"],
    # small-input total sort: stats-picked single-stage coalesce(1) sort —
    # no range-sampling job, no exchange (VERDICT r3 item 2)
    "o1_full_sort": ["Coalesce", "Sort"],
    "w2_rank_topk_per_group": ["WindowGroupLimit"],
    "q1_pricing_summary": ["HashAggregate", "PushedFilters: [IsNotNull(l_shipdate)"],
    "pipe_hung_councils": ["BroadcastHashJoin", "HashAggregate"],
    "pipe_voter_turnout": ["BroadcastHashJoin"],
    "sim_topk_cosine": ["BroadcastNestedLoopJoin"],  # deliberate: tiny query side
    # hard-negative mining: anchor batch broadcasts (label-mismatch is
    # the non-equi join predicate); per-anchor top-k pushes the limit
    "sim_hard_negatives": ["BroadcastNestedLoopJoin", "WindowGroupLimit"],
    # kNN graph: bounded exact tier — directed top-k via WindowGroupLimit,
    # then ONE hash agg on the unordered edge key for the symmetrize
    "sim_knn_graph": ["WindowGroupLimit", "HashAggregate"],
    # MMR: stage 1 is the cosine_topk shape (broadcast query side);
    # the unrolled greedy stages read the persisted candidate table
    "sim_mmr_rerank": ["BroadcastNestedLoopJoin", "InMemoryTableScan"],
    # FFD packing: ONE group exchange into the Arrow grouped-map pass
    "pack_ffd": ["FlatMapGroupsInPandas"],
    # quantile normalization: the 1-row total broadcasts; the global
    # order is ONE range exchange (global_row_number), never a
    # single-partition window
    "sample_quantile_normalize": ["BroadcastNestedLoopJoin"],
    # hamming prefilter: tiny signed query side broadcasts into a
    # nested-loop popcount filter; the corpus is scanned in place
    "sim_topk_hamming": ["BroadcastNestedLoopJoin"],
    # quantized tier keeps the same shape: corpus scanned in place,
    # quantized queries broadcast
    "sim_topk_quantized": ["BroadcastNestedLoopJoin"],
    "q5_local_supplier_volume": ["BroadcastHashJoin"],
    # the max_df hot-shingle filter must be a broadcast anti-join (the hot
    # set is tiny by construction; shuffling grams for it would be wrong)
    "dedup_max_df_guard": ["LeftAnti, BuildRight"],
    # z-order: the per-column bounds join in a 1-row broadcast NLJ, and
    # the cluster key drives a single range-partitioning exchange
    "layout_zorder_write": ["BroadcastNestedLoopJoin", "rangepartitioning"],
    # per-domain quota: the rank<=cap filter must push into the sort
    "sample_cap_per_source": ["WindowGroupLimit"],
    # weighted top-k must never global-sort
    "sample_weighted": ["TakeOrderedAndProject"],
    "q4_order_priority": ["LeftSemi"],
    # Q21: EXISTS -> semi, NOT EXISTS -> anti, both with non-equi residual
    "q21_waiting_suppliers": ["LeftSemi", "LeftAnti"],
    # Q19: disjunctive brackets must still broadcast the part side
    "q19_disjunctive_brackets": ["BroadcastHashJoin"],
    # top-k never global-sorts; dims broadcast
    "q10_returned_items": ["TakeOrderedAndProject", "BroadcastHashJoin"],
    "q7_nation_volume": ["BroadcastHashJoin"],
    # 6-table star: every dim broadcasts, lineitem never exchanges pre-agg
    "q8_market_share": ["BroadcastHashJoin"],
    # decontamination: the eval shingle table must be the broadcast side
    # (the training corpus never shuffles for the overlap join)
    "dedup_decontaminate": ["BroadcastHashJoin"],
    # r4 "sets" verification: the bounded candidate-pair list must be
    # the broadcast side (the per-doc set table is never broadcast —
    # the r3 OOM hazard was a promoted broadcast of the shingle table)
    "dedup_minhash_lsh": ["BroadcastHashJoin"],
    # bucketed co-located join: the bucket spec must satisfy the join
    # AND the bucket-key agg with no exchange anywhere
    "layout_bucketed_join": ["SortMergeJoin", "Bucketed: true"],
    # hive-partitioned scan: the literal day must land in PartitionFilters
    # (directory-level pruning at planning time, not a row-level filter)
    "layout_partition_pruned_scan": [
        "PartitionFilters: [isnotnull(event_date"],
    # r9 strip rebuild: the per-doc span arrays BROADCAST into the
    # corpus scan as the build side of a left-outer join — the corpus
    # token arrays never shuffle; the only Windows left in the plan
    # belong to the tiny span-detection subtree
    "dedup_substring_strip": ["LeftOuter, BuildRight"],
    # substring span dedup: ONE exchange on the gram hash (min!=max
    # window fusion), then the doc-keyed interval merge; the per-doc
    # stats join back by broadcast
    "dedup_substring_stats": ["Exchange hashpartitioning(gkey",
                              "BroadcastHashJoin"],
    # semantic decontamination: eval side broadcasts into a nested-loop
    # cosine filter; the training corpus must never shuffle pre-filter
    "sim_decontaminate": ["BroadcastNestedLoopJoin"],
    # end-to-end prep: the survivor-id semi-join must broadcast
    "pipe_training_data_prep": ["LeftSemi, BuildRight"],
    # bloom incremental dedup: the corpus digests are probed in place by
    # a broadcast semi-join of the (tiny) bloom-positive fp set, and the
    # found set comes back as a broadcast anti-join build side
    "dedup_incremental_bloom": ["LeftSemi, BuildRight", "LeftAnti, BuildRight"],
    # correlated LATERAL ... ORDER BY ... LIMIT must decorrelate into the
    # w2 plan family: per-key WindowGroupLimit + broadcast of the 5-row
    # outer side (never a per-outer-row re-execution or a cross product)
    "j13_lateral_topn": ["WindowGroupLimit", "BroadcastHashJoin"],
    # native unpivot is a single Expand over the fused agg — no join,
    # no second pass over lineitem
    "r6_unpivot_native": ["Expand", "HashAggregate"],
    # VARIANT path: props parses once inside the pre-agg projection
    "e15_variant_json": ["variant_get", "HashAggregate"],
    # global row numbering: the returned plan is the NARROW numbering
    # pass over the pinned range-partitioned checkpoint — one Arrow
    # stage, no exchange, no window (the range shuffle already happened
    # eagerly and is the only one the op ever pays)
    "layout_global_row_number": ["MapInPandas", "Scan ExistingRDD"],
    # snapshot diff: full-outer on the key with md5 digests computed
    # BELOW the exchange (the shuffle moves fingerprints, not text)
    "snapshot_diff": ["FullOuter", "Exchange hashpartitioning(doc_id"],
    # incremental admission: the delta narrows via the digest full-outer,
    # the corpus rejection is an anti-join with the digest set as the
    # broadcast build side (32-byte fps, never documents)
    "pipe_incremental_ingest": ["FullOuter", "LeftAnti, BuildRight"],
    # hashed classifier: weight lookup is an expression (no join); the
    # per-doc score is a per-row array fold (r11) — pure map, no agg.
    # r12 (ADVICE r11): assert the FOLD itself (the aggregate-over-
    # tokens lambda in the Project), not a bare "Project" — essentially
    # every plan contains a Project, so that positive assertion was
    # vacuous; this one breaks if the fold rewrite regresses to an
    # explode/groupBy shape (the MUST_NOT list forbids the operators,
    # this pins the replacement expression's presence)
    "text_quality_classifier": ["aggregate(__arr"],
    # sampled ccnet: the cut-point table is tiny -> broadcast into the
    # full-corpus assignment; the per-lang sort touches only the sample
    "text_ccnet_buckets_sampled": ["BroadcastHashJoin"],
    # r5 simhash hot-band guard: the hot (chunk, cval) set is tiny by
    # construction -> must be a broadcast anti-join on BOTH sides of the
    # candidate join (shuffling the chunk table for the guard is wrong)
    "dedup_simhash_guarded": ["LeftAnti, BuildRight"],
    # real media decode: one narrow Arrow pass; the binary payload
    # column must never reach an exchange
    "multimodal_decode": ["MapInPandas"],
    # BM25: the query term list and the (query-terms-sized) df table
    # must both broadcast; per-query top-k via WindowGroupLimit
    "text_bm25_topk": ["BroadcastHashJoin", "WindowGroupLimit",
                       "InMemoryTableScan"],  # r8: single-build tf index
    # BM25 scan plan (r9): the term list joins the corpus by
    # array_contains under a broadcast NESTED-LOOP (never a cross
    # product), tf/dl row-local — no inverted-index build, no persist
    "text_bm25_topk_scan": ["BroadcastNestedLoopJoin", "WindowGroupLimit"],
    # temperature mixing: the derived per-source rate table broadcasts
    # into a narrow keep filter
    "sample_temperature_mixture": ["BroadcastHashJoin"],
    # PQ ADC + rerank: encode/score/rescore are Arrow passes; the
    # shortlist must BROADCAST into the float-vector rerank scan (the
    # corpus never shuffles); top-k per query via WindowGroupLimit
    "sim_topk_pq": ["MapInPandas", "WindowGroupLimit",
                    "BroadcastHashJoin"],
    # RRF fusion: final per-query top-k is a WindowGroupLimit; the
    # lexical half keeps BM25's broadcast joins and the single-build
    # persisted tf index (VERDICT r8 item 5: the index must build ONCE
    # per action — asserted by InMemoryTableScan presence; the r9 scan
    # leg A/B'd slower in this sf0.1 composition, see the entry)
    "sim_hybrid_rrf": ["WindowGroupLimit", "BroadcastHashJoin",
                       "InMemoryTableScan"],
    # token budget: one group exchange + a running-sum window, nothing else
    "sample_token_budget_cap": ["Window"],
    # contamination: the eval shingle set must broadcast into the
    # training-corpus match (corpus never shuffles pre-aggregate)
    "dedup_contamination_score": ["BroadcastHashJoin"],
    # skew profiler: top-N must be a distributed heap top-k, never a
    # global-sort window over the whole count table
    "profile_key_skew": ["TakeOrderedAndProject"],
    # fingerprint: one scan folding to one row — partial aggregates,
    # no exchange of anything but the 1-row partials
    "profile_dataset_fingerprint": ["HashAggregate"],
    # OLS trend: the 1-row x-rebase must broadcast, the grouped sums
    # are one map-side-combined agg
    "profile_trend_ols": ["BroadcastNestedLoopJoin", "HashAggregate"],
    # mixture recipe: derived rate table broadcasts into the keep
    # filter; the only exchange moving docs is the budget window's
    # group sort
    "pipe_mixture_recipe": ["BroadcastHashJoin", "Window"],
    # loader order: global_row_number's eager localCheckpoint truncates
    # the visible plan (the bin broadcast join runs before it), so only
    # the negative assertions below are checkable on the executed plan
    # full IVF-PQ: the probe (query, centroid) table and the rerank
    # shortlist both broadcast; codes attach in the same Arrow pass as
    # assignment (no assignment-to-codes join)
    "sim_topk_ivf_pq": ["MapInPandas", "WindowGroupLimit",
                        "BroadcastHashJoin"],
    # the ORC re-read must push the key predicate into the ORC scan,
    # exactly as the parquet scans do
    "source_orc_roundtrip": ["PushedFilters: [", "LessThan(o_orderkey"],
    # BPE apply is one narrow Arrow pass
    "text_bpe_tokenize": ["MapInPandas"],
    # r10 codec round-trips: synthesize -> decode are Arrow passes; the
    # RLE/GIF/G.711/ADPCM payload columns never reach an exchange
    # (asserted via MUST_NOT below)
    "multimodal_decode_rle": ["MapInPandas"],
    "multimodal_decode_gif": ["MapInPandas"],
    "multimodal_decode_adpcm": ["MapInPandas"],
    "multimodal_decode_ulaw": ["MapInPandas"],
    "multimodal_decode_alaw": ["MapInPandas"],
    "multimodal_decode_flac": ["MapInPandas"],
    "multimodal_decode_flac_stereo": ["MapInPandas"],
    # BPE distinct tier (via the auto dispatcher): the vocab-sized
    # piece table must join back by BROADCAST (corpus tokens shuffle
    # only for the per-doc regroup)
    "text_bpe_encode_auto": ["MapInPandas", "BroadcastHashJoin"],
    # r11 TPC-H completions: every dim chain broadcasts into the fact
    # scan; q2's correlated MIN decorrelates into a pair-grain window
    "q2_min_cost_supplier": ["BroadcastHashJoin", "Window"],
    # q11's 1-row total broadcasts back as a nested-loop cross
    "q11_important_stock": ["BroadcastHashJoin", "BroadcastNestedLoopJoin",
                            "HashAggregate"],
    "q20_excess_suppliers": ["BroadcastHashJoin", "HashAggregate"],
    # r11 quality gates: the whole constraint suite folds into one
    # wide aggregate over one scan (the single COUNT(DISTINCT) plans
    # as the two-level partial-agg pair, no Expand needed)
    "profile_constraint_check": ["HashAggregate"],
    "profile_k_anonymity": ["HashAggregate"],
}

# query -> substrings that must NOT appear
MUST_NOT = {
    # at result scale the total sort must NOT pay a range exchange (its
    # scale path above 64 MB est. keeps one; asserted at the bench sf)
    "o1_full_sort": ["Exchange rangepartitioning"],
    "sample_hash_mod": ["Exchange"],   # a deterministic sample is a narrow filter
    "sample_assign_splits": ["Exchange"],  # split labels are a narrow projection
    "j12_interval_join": ["CartesianProduct"],  # bin join, never cross
    # no 399k-key broadcast collect may exist (the anti builds from the
    # okey exchange); exchange-count discipline is asserted by the
    # MUST_HAVE shuffled-hash + single-key exchange fragments
    "j4_anti_join": ["BroadcastExchange"],
    # the binary payload column must NEVER shuffle: synthesize ->
    # decode -> project is one narrow mapInPandas chain over the scan
    "multimodal_decode_png": ["Exchange"],
    # same discipline for the AVI frame expander: frames never shuffle,
    # the byte stats compute in the projection above the row-expander
    "multimodal_frame_sample": ["Exchange"],
    "j1_dim_join": ["SortMergeJoin", "CartesianProduct"],
    "pipe_hung_councils": ["SortMergeJoin", "CartesianProduct"],
    # r6 one-scan shape: both aggs ride the okey repartition, orders
    # broadcasts — no sort-merge anywhere and no second fact exchange
    "pipe_voter_turnout": ["CartesianProduct", "SortMergeJoin"],
    "q1_pricing_summary": ["Exchange hashpartitioning(l_orderkey"],
    # the corpus side must not shuffle before the hamming filter; the only
    # exchange allowed is the per-query top-k window on the survivors
    "sim_topk_hamming": ["SortMergeJoin", "CartesianProduct"],
    "sim_topk_quantized": ["SortMergeJoin", "CartesianProduct"],
    "dedup_minhash_lsh": ["CartesianProduct"],
    # the corpus digest scan must never shuffle: no SMJ anywhere in the
    # bloom path (negatives skip joins entirely; positives broadcast)
    "dedup_incremental_bloom": ["SortMergeJoin", "CartesianProduct"],
    # the within-cluster self-join keys on the signature — equi-join
    # only, never a cross product
    "sim_semantic_dedup": ["CartesianProduct"],
    "layout_bucketed_join": ["Exchange"],
    # signature banding is equi-keyed; the 1-row vocab scalar is the
    # only nested-loop allowed in the LM stack
    "sim_embedding_dup_pairs": ["CartesianProduct"],
    "text_lm_perplexity": ["CartesianProduct"],
    "pipe_corpus_curation": ["CartesianProduct"],
    # positions join back to dup grams 1:1 — never pairwise, never SMJ
    # (the only joins are the broadcast stats lookup)
    "dedup_substring_stats": ["CartesianProduct", "SortMergeJoin"],
    "dedup_substring_strip": ["CartesianProduct", "SortMergeJoin"],
    "sim_decontaminate": ["SortMergeJoin", "CartesianProduct"],
    "pipe_training_data_prep": ["CartesianProduct"],
    # decode is a pure narrow map: synthesize -> decode with no shuffle
    "multimodal_decode": ["Exchange", "SortMergeJoin"],
    # r10 codecs: same no-payload-exchange discipline
    "multimodal_decode_rle": ["Exchange", "SortMergeJoin"],
    "multimodal_decode_gif": ["Exchange", "SortMergeJoin"],
    "multimodal_decode_adpcm": ["Exchange", "SortMergeJoin"],
    "multimodal_decode_ulaw": ["Exchange", "SortMergeJoin"],
    "multimodal_decode_alaw": ["Exchange", "SortMergeJoin"],
    "multimodal_decode_flac": ["Exchange", "SortMergeJoin"],
    "multimodal_decode_flac_stereo": ["Exchange", "SortMergeJoin"],
    "text_bpe_encode_auto": ["SortMergeJoin", "CartesianProduct"],
    "j13_lateral_topn": ["CartesianProduct", "SortMergeJoin"],
    "r6_unpivot_native": ["Generate"],  # unpivot must not fall back to explode
    # numbering must never re-shuffle, re-sort, or plan a global window
    "layout_global_row_number": ["Exchange", "Window", "Sort"],
    "snapshot_diff": ["CartesianProduct"],
    "pipe_incremental_ingest": ["CartesianProduct"],
    # the model is an expression: no join, no Python boundary; r11 —
    # the per-doc fold also removed the explode and the doc_id exchange
    "text_quality_classifier": ["Join", "BatchEvalPython", "ArrowEvalPython",
                                "Exchange", "HashAggregate", "Generate"],
    # per-doc token stats are per-row array expressions (r11): corpus
    # tokens never leave their partitions — no explode, no exchange
    "text_quality_score": ["Exchange", "Join", "Generate",
                           "BatchEvalPython", "ArrowEvalPython"],
    "text_lang_id": ["Exchange", "Join", "Generate",
                     "BatchEvalPython", "ArrowEvalPython"],
    # epoch mixing is a narrow explode+filter: no shuffle, no join
    "sample_epoch_repeat": ["Exchange", "Join"],
    # chunking is one narrow explode: no shuffle, no join, no Python
    "pack_chunk_documents": ["Exchange", "Join", "BatchEvalPython",
                             "ArrowEvalPython"],
    # the corpus-side assignment must never sort-merge on lang
    "text_ccnet_buckets_sampled": ["SortMergeJoin", "CartesianProduct"],
    # tokenization must stay shuffle- and join-free
    "text_bpe_tokenize": ["Exchange", "Join"],
    # BM25: the retrieval joins are broadcast or doc-keyed equi — never
    # a cross product; the corpus text never reaches a sort-merge
    "text_bm25_topk": ["CartesianProduct"],
    "text_bm25_topk_scan": ["CartesianProduct", "SortMergeJoin"],
    # the corpus keep-filter must stay narrow: no corpus-side shuffle
    "sample_temperature_mixture": ["SortMergeJoin", "CartesianProduct"],
    # codes never shuffle before scoring; the only exchange is the
    # per-query top-k window over (query, neighbor, score) candidates
    "sim_topk_pq": ["SortMergeJoin", "CartesianProduct"],
    "sim_topk_ivf_pq": ["SortMergeJoin", "CartesianProduct"],
    # fusion + both retrievers: never an unconditioned cross product
    # (the dense side's != join is a broadcast nested loop by design)
    "sim_hybrid_rrf": ["CartesianProduct"],
    "dedup_contamination_score": ["CartesianProduct"],
    # the corpus must never sort-merge anywhere in the mixing chain
    "pipe_mixture_recipe": ["SortMergeJoin", "CartesianProduct"],
    "pipe_loader_order": ["SortMergeJoin", "CartesianProduct"],
    "profile_key_skew": ["CartesianProduct"],
    "agg_incremental_merge": ["CartesianProduct", "SortMergeJoin"],
    "dedup_pagerank_centrality": ["CartesianProduct"],
    # audit + normalization chains must never cross-product or
    # sort-merge the doc side
    "pipe_dedup_audit": ["CartesianProduct"],
    "sample_quantile_normalize": ["CartesianProduct"],
    # r11 TPC-H completions: the fact side must never sort-merge or
    # cross-product (dims are broadcast-sized by construction)
    "q2_min_cost_supplier": ["SortMergeJoin", "CartesianProduct"],
    "q11_important_stock": ["SortMergeJoin", "CartesianProduct"],
    "q20_excess_suppliers": ["SortMergeJoin", "CartesianProduct"],
    # the constraint suite and the anonymity audit are scan+agg only
    "profile_constraint_check": ["Join", "Exchange rangepartitioning"],
    "profile_k_anonymity": ["Join", "Exchange rangepartitioning"],
}

# query -> [(fragment, max occurrences)] — caps on EXPENSIVE expressions
# that predicate-pushdown substitution can silently duplicate (r8: the
# rounded-jaccard filter inlined into a join condition evaluated
# array_intersect 24x per candidate pair; the integer _keep_ratio_ge
# predicate brought it to 3 — lock that in)
MAX_COUNT = {
    "dedup_jaccard_prefix": [("array_intersect", 4)],
    "dedup_minhash_lsh": [("array_intersect", 4)],
}

# query -> [(fragment, min occurrences)] — floors proving subtree REUSE:
# a persisted relation consumed by N plan branches must show N
# InMemoryTableScan readers (one build, N reads), not N rebuilt subtrees
MIN_COUNT = {
    # VERDICT r8 item 5: the BM25 tf index builds ONCE per action and
    # all downstream branches (stats, matched) read the cache
    "sim_hybrid_rrf": [("InMemoryTableScan", 2)],
    "text_bm25_topk": [("InMemoryTableScan", 2)],
}

AUDIT = [
    "s1_scan_project", "p3_filter_conj", "j1_dim_join", "j2_three_table",
    "j4_anti_join", "j7_deloop_semi", "a1_a2_j3_grouped_sum_count",
    "a10_grouped_ordered_concat", "w2_rank_topk_per_group", "o1_o3_topk_sort",
    "q1_pricing_summary", "pipe_hung_councils", "pipe_voter_turnout",
    "events_sessionize", "dedup_minhash_lsh", "sim_topk_cosine",
    "sim_topk_hamming", "sim_topk_quantized",
    "q5_local_supplier_volume", "sample_hash_mod",
    "dedup_max_df_guard", "layout_zorder_write", "sample_cap_per_source",
    "q4_order_priority", "q10_returned_items", "q7_nation_volume",
    "q8_market_share", "dedup_decontaminate", "sample_assign_splits",
    "j12_interval_join", "sim_embedding_dup_pairs", "text_lm_perplexity",
    "pipe_corpus_curation", "q21_waiting_suppliers",
    "q19_disjunctive_brackets", "sample_weighted", "o1_full_sort",
    "dedup_incremental_bloom", "sim_semantic_dedup", "layout_bucketed_join",
    "layout_partition_pruned_scan", "dedup_substring_stats",
    "dedup_substring_strip",
    "sim_decontaminate", "pipe_training_data_prep",
    "j13_lateral_topn", "r6_unpivot_native", "e15_variant_json",
    "layout_global_row_number", "snapshot_diff", "pipe_incremental_ingest",
    "text_quality_classifier", "text_quality_score", "text_lang_id",
    "sample_epoch_repeat",
    "pack_chunk_documents", "text_ccnet_buckets_sampled",
    "dedup_simhash_guarded", "multimodal_decode",
    "text_bm25_topk", "text_bm25_topk_scan",
    "sample_temperature_mixture", "sim_topk_pq",
    "sim_topk_ivf_pq", "source_jsonl_roundtrip", "source_orc_roundtrip",
    "text_bpe_tokenize", "sim_hybrid_rrf", "sample_token_budget_cap",
    "dedup_contamination_score", "profile_key_skew",
    "agg_incremental_merge", "dedup_pagerank_centrality",
    "profile_dataset_fingerprint", "profile_trend_ols",
    "pipe_mixture_recipe", "pipe_loader_order",
    "sim_hard_negatives", "sim_knn_graph", "sim_mmr_rerank",
    "pack_ffd", "sample_quantile_normalize", "pipe_dedup_audit",
    "multimodal_decode_png", "multimodal_frame_sample",
    "multimodal_decode_rle", "multimodal_decode_gif",
    "multimodal_decode_adpcm", "multimodal_decode_ulaw",
    "multimodal_decode_alaw", "multimodal_decode_flac",
    "multimodal_decode_flac_stereo",
    "text_bpe_encode_auto",
    "q2_min_cost_supplier", "q11_important_stock", "q20_excess_suppliers",
    "profile_constraint_check", "profile_k_anonymity",
]


def _dedup_max_df_guard(spark, sf_dir):
    """Non-registry audit subject: the hot-shingle guard's plan — the hot
    set must reach the grams anti-join as a BROADCAST build side (a
    shuffled anti-join would re-shuffle the full shingle table)."""
    from pyspark.sql import functions as F

    from sanef_election_dashboard_etl_spark.operators import dedup as D
    documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return D.jaccard_pairs(D.token_set(documents.filter(F.col("doc_id") < 200)),
                           min_jaccard=0.8, max_df=50)


def _layout_zorder_write(spark, sf_dir):
    """Non-registry audit subject: the clustered-write layout plan —
    exactly one exchange (range on the z-value), bounds broadcast."""
    from sanef_election_dashboard_etl_spark.operators import layout as L
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return L.z_order(part, ["p_size", "p_partkey"], bits=8, num_partitions=4)


def _layout_bucketed_join(spark, sf_dir):
    """Non-registry audit subject: co-located join over bucketed tables —
    the whole join + bucket-key agg must run with ZERO exchanges (the
    bucket spec satisfies both distribution requirements)."""
    from pyspark.sql import functions as F

    from sanef_election_dashboard_etl_spark.operators.layout import \
        bucketed_write
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .select("l_orderkey", "l_quantity")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_orderstatus")
    bucketed_write(li, "audit_li_bkt", ["l_orderkey"], 4,
                   sort_keys=["l_orderkey"])
    bucketed_write(od, "audit_od_bkt", ["o_orderkey"], 4,
                   sort_keys=["o_orderkey"])
    bl, bo = spark.table("audit_li_bkt"), spark.table("audit_od_bkt")
    return (bl.hint("merge")
            .join(bo, bl["l_orderkey"] == bo["o_orderkey"])
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("qty")))


EXTRA_BUILDERS = {"dedup_max_df_guard": _dedup_max_df_guard,
                  "layout_zorder_write": _layout_zorder_write,
                  "layout_bucketed_join": _layout_bucketed_join}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")

    failures = []
    out = ["# PLANS — executed physical plans of the headline queries",
           "",
           f"Generated by `tools/explain_audit.py` at `{sf_dir}`. Assertions",
           "from SCALE.md are checked mechanically; a failing assertion fails",
           "the tool. (AQE is session-default ON here, so plans show",
           "AdaptiveSparkPlan; `isFinalPlan=false` means pre-execution.)", ""]
    for name in AUDIT:
        df = (EXTRA_BUILDERS[name](spark, sf_dir) if name in EXTRA_BUILDERS
              else REGISTRY[name].fn(spark, sf_dir))
        plan = df._jdf.queryExecution().executedPlan().toString()
        for frag in MUST_HAVE.get(name, []):
            if frag not in plan:
                failures.append(f"{name}: missing {frag!r}")
        for frag in MUST_NOT.get(name, []):
            if frag in plan:
                failures.append(f"{name}: unexpected {frag!r}")
        for frag, cap in MAX_COUNT.get(name, []):
            n = plan.count(frag)
            if n > cap:
                failures.append(f"{name}: {frag!r} appears {n}x > cap {cap}"
                                " (expensive-expression duplication)")
        for frag, floor in MIN_COUNT.get(name, []):
            n = plan.count(frag)
            if n < floor:
                failures.append(f"{name}: {frag!r} appears {n}x < floor "
                                f"{floor} (expected subtree reuse)")
        checks = (f"must-have: {MUST_HAVE.get(name, [])}  "
                  f"must-not: {MUST_NOT.get(name, [])}"
                  + (f"  max-count: {MAX_COUNT[name]}"
                     if name in MAX_COUNT else "")
                  + (f"  min-count: {MIN_COUNT[name]}"
                     if name in MIN_COUNT else ""))
        out += [f"## {name}", "", f"_{checks}_", "", "```",
                plan.rstrip()[:4000], "```", ""]

    with open("/root/repo/PLANS.md", "w") as fh:
        fh.write("\n".join(out))

    if failures:
        print("PLAN ASSERTIONS FAILED:")
        for f in failures:
            print(" -", f)
        return 1
    print(f"all plan assertions hold for {len(AUDIT)} queries; PLANS.md written")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
