"""Reproducible sampling for training-data pipelines (SURVEY.md §7 family).

RNG-based `df.sample()` depends on partition layout — re-partition the
input and the sample changes, which poisons dataset reproducibility. The
scale-correct pattern is HASH-MOD sampling: a row is in the p% sample iff
`hash(stable_key) mod M < p*M`. Properties:

- deterministic across runs, partitionings, and engines (portable_hash);
- composable: the 1% sample is a subset of the 10% sample (same hash);
- joinable: sampling two tables by the same key keeps them aligned.

`stratified_hash_sample` varies the rate per stratum (the class-balance
knob: downsample dominant languages, keep rare ones whole).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash

_M = 10_000  # rate resolution: 0.01%


def hash_bucket(key: Column, buckets: int = _M) -> Column:
    """Stable [0, buckets) bucket for a key column."""
    return F.pmod(portable_hash(key), F.lit(buckets))


def hash_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Deterministic `rate` sample keyed on `key_col` (narrow: a filter,
    no shuffle, pushdown-friendly)."""
    return df.filter(hash_bucket(F.col(key_col).cast("string")) <
                     F.lit(int(rate * _M)))


def stratified_hash_sample(df: DataFrame, key_col: str, stratum_col: str,
                           rates: Mapping[str, float],
                           default_rate: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling: `rates[stratum]` fraction of
    each stratum survives (unlisted strata get `default_rate`)."""
    threshold = None
    for stratum, rate in rates.items():
        cond = F.when(F.col(stratum_col) == stratum, F.lit(int(rate * _M)))
        threshold = cond if threshold is None else threshold.when(
            F.col(stratum_col) == stratum, F.lit(int(rate * _M)))
    threshold = (threshold.otherwise(F.lit(int(default_rate * _M)))
                 if threshold is not None else F.lit(int(default_rate * _M)))
    return df.filter(hash_bucket(F.col(key_col).cast("string")) < threshold)


def cap_per_group(df: DataFrame, group_col: str, cap: int,
                  order_col: str = "doc_id",
                  shuffle_order: bool = False) -> DataFrame:
    """Keep at most `cap` rows per group — the per-domain quota that web
    corpora (C4/CCNet-style) apply so one crawl-heavy domain can't
    dominate the training mix. No reference analog (the reference keeps
    every row, SANEF_Uploader.py writes full frames); this is pure
    LLM-pipeline surface.

    Deterministic: rows ranked by `order_col` within each group (or by a
    stable hash of it with `shuffle_order=True`, which decorrelates the
    kept subset from crawl/id order — hash rank, never RNG, so reruns and
    engines agree). Plan shape: one shuffle on `group_col` and a
    WindowGroupLimit — Spark pushes the rank filter into the sort, so
    each partition keeps only `cap` rows per group during the sort
    rather than ranking everything first (asserted in
    tools/explain_audit.py). Skew note: a mega-domain still sorts its
    rows in one partition; for truly pathological domains pre-filter
    with an approximate per-group count and hash_sample the giants down
    to ~cap first, then apply the exact cap."""
    from pyspark.sql import Window

    order = (portable_hash(F.col(order_col).cast("string")) if shuffle_order
             else F.col(order_col))
    w = Window.partitionBy(group_col).orderBy(order.asc(),
                                              F.col(order_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= cap)
              .drop("__rn"))


def assign_splits(df: DataFrame, key_col: str,
                  splits: Mapping[str, float] | None = None,
                  out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: each row gets a split
    label from contiguous hash-bucket ranges of its key — the dataset
    split that survives reruns, repartitioning, and engine changes
    (hash ranges, never RNG), and stays CONSISTENT across tables: any
    table split on the same key puts a given document on the same side,
    so features never leak across the boundary via a sibling table.

    Narrow projection (no shuffle); split fractions resolve at _M=10000
    resolution. Fractions must sum to <= 1; any remainder falls into the
    last split (ranges are [lo, hi) except the last, which absorbs the
    tail so every row is labeled)."""
    splits = dict(splits or {"train": 0.9, "val": 0.05, "test": 0.05})
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    b = hash_bucket(F.col(key_col).cast("string"))
    expr = None
    lo = 0
    names = list(splits)
    for i, name in enumerate(names):
        hi = _M if i == len(names) - 1 else lo + int(splits[name] * _M)
        cond = b < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return df.withColumn(out_col, expr)


def winsorize(df: DataFrame, value_col: str, lo: float = 0.01,
              hi: float = 0.99, out_col: str | None = None) -> DataFrame:
    """Percentile winsorization: clip `value_col` to its [lo, hi]
    quantile bounds — the outlier guard applied before averaging noisy
    metrics (the reference averages raw columns, SANEF_Uploader.py
    Results aggregation; at corpus scale a handful of garbage rows can
    own a mean).

    The bounds are ONE exact-percentile aggregate row broadcast back
    over the data (same 1-row crossJoin shape as z-order's min/max); the
    clip itself is a narrow least/greatest projection. At 100 TB swap
    F.percentile for percentile_approx to avoid the global sort — the
    clip plumbing is unchanged (docstring contract: exact = the
    verification configuration, approx = the production one)."""
    out_col = out_col or f"{value_col}_winsorized"
    v = F.col(value_col)
    bounds = df.agg(F.percentile(value_col, F.lit(lo)).alias("__lo"),
                    F.percentile(value_col, F.lit(hi)).alias("__hi"))
    return (df.crossJoin(F.broadcast(bounds))
              .withColumn(out_col,
                          F.least(F.greatest(v, F.col("__lo")),
                                  F.col("__hi")))
              .drop("__lo", "__hi"))


def mixture_sample(df: DataFrame, weights: Mapping[str, float],
                   budget_tokens: int, default_weight: float = 0.0,
                   id_col: str = "doc_id", source_col: str = "source",
                   text_col: str = "text") -> DataFrame:
    """Corpus MIXTURE sampling (the Pile/LLaMA-style mixing step): size
    each source's deterministic sampling fraction so its expected
    sampled token count is ~ weight * budget_tokens, capped at taking
    the whole source. The step that turns N raw crawls plus target
    mixture weights into one training corpus.

    fraction_s = min(1, weight_s * budget_tokens / total_tokens_s),
    applied as a hash-bucket threshold on the doc id — the same
    partition-layout-independent sampling as hash_sample, so reruns and
    repartitions keep the identical doc set. Token totals are one
    per-source aggregate (tiny, broadcast back); the keep filter is a
    narrow projection — the corpus never shuffles. Unlisted sources get
    `default_weight`. Output (doc_id, source, n_tokens) of kept docs.

    Integer threshold math: floor(weight * budget * 10000 / total) with
    every operand identical in both engines, so the oracle reproduces
    the exact doc set.

    Null text counts as 0 tokens (greatest(0, coalesce(...)) guards both
    Spark's size()-of-null conventions, -1 legacy / NULL ansi) so a
    null-text doc contributes 0 to the per-source total and carries
    n_tokens=0 in the output — the oracle applies the identical guard,
    keeping totals and rows aligned by construction even if a future
    fixture generation ships null text (ADVICE r3)."""
    n_tokens = F.greatest(
        F.lit(0),
        F.coalesce(F.size(F.split(F.trim(F.col(text_col)), r"\s+")),
                   F.lit(0))).cast("long")
    with_t = df.select(F.col(id_col), F.col(source_col),
                       n_tokens.alias("n_tokens"))
    totals = with_t.groupBy(source_col).agg(
        F.sum("n_tokens").alias("__total"))
    w = None
    for src, wt in weights.items():
        cond = F.when(F.col(source_col) == src, F.lit(float(wt)))
        w = cond if w is None else w.when(F.col(source_col) == src,
                                          F.lit(float(wt)))
    w = (w.otherwise(F.lit(float(default_weight)))
         if w is not None else F.lit(float(default_weight)))
    threshold = F.least(
        F.lit(_M).cast("long"),
        F.floor(w * F.lit(float(budget_tokens)) * F.lit(float(_M))
                / F.col("__total")))
    return (with_t.join(F.broadcast(totals), source_col)
            .filter(hash_bucket(F.col(id_col).cast("string")) < threshold)
            .select(id_col, source_col, "n_tokens"))


def weighted_sample(df: DataFrame, weight_col: str, k: int,
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES): each row gets key = ln(u) / w for a
    hash-derived uniform u in (0,1); the k largest keys are a weighted
    sample without replacement — e.g. quality-weighted corpus
    subsampling, where a doc with twice the weight is twice as likely
    to make the cut.

    Replacing the RNG with the portable id hash keeps the sample
    reproducible across runs, partitionings, and engines (the property
    every df.sample() lacks); u = (bucket + 0.5) / 10000 never hits 0
    or 1. The top-k is a TakeOrderedAndProject (no global sort
    materialization); keys round at 1e-9 with id tiebreak so ordering
    is engine-deterministic. Rows with weight <= 0 never qualify.
    Output (id, weight, key) of the k selected rows."""
    u = (hash_bucket(F.col(id_col).cast("string")).cast("double")
         + F.lit(0.5)) / F.lit(float(_M))
    w = F.col(weight_col).cast("double")
    key = F.round(F.log(u) / w, 9)
    return (df.filter(w > 0)
            .select(F.col(id_col), w.alias("weight"), key.alias("key"))
            .orderBy(F.desc("key"), F.asc(id_col))
            .limit(k))


def epoch_repeat(df: DataFrame, epochs: Mapping[str, float],
                 default_epochs: float = 1.0, key_col: str = "doc_id",
                 source_col: str = "source") -> DataFrame:
    """Fractional per-source epoch oversampling — the data-mixing knob
    LLM recipes express as "Wikipedia x2.5, web x0.6": every row is
    emitted floor(e) times, plus one extra copy for the deterministic
    hash-selected frac(e) fraction of keys. e < 1 downsamples (0 full
    copies, frac(e) of keys keep one), e > 1 upsamples, e = 0 drops
    the source. Emitted `epoch` ordinals let downstream shuffles (e.g.
    layout.epoch_shuffle) decorrelate the copies.

    Determinism: the fractional copy is hash-mod on the key (same
    portable_hash as hash_sample), so the mixed corpus is reproducible
    across runs, partitionings, and engines, and the e=2.5 output is a
    superset of the e=2.0 output.

    Scale: explode(sequence(0, ceil(e)-1)) is a narrow per-row fan-out
    (max ceil(e) copies, no shuffle, no join); the filter folds into
    the same stage. At 100 TB this is the one-pass materialization of
    a mixture spec — output size is sum_s e_s * |s| by construction."""
    src = F.col(source_col)
    full_c, thr_c, ncopies_c = None, None, None

    def _case(acc, cond, val):
        return F.when(cond, val) if acc is None else acc.when(cond, val)

    for s, e in epochs.items():
        if e < 0:
            raise ValueError(f"epochs must be >= 0, got {s}={e}")
        full = int(e)
        thr = round((e - full) * _M)
        full_c = _case(full_c, src == s, F.lit(full))
        thr_c = _case(thr_c, src == s, F.lit(thr))
        ncopies_c = _case(ncopies_c, src == s,
                          F.lit(max(1, full + (1 if thr > 0 else 0))))
    dfull = int(default_epochs)
    dthr = round((default_epochs - dfull) * _M)
    dn = max(1, dfull + (1 if dthr > 0 else 0))
    full_c = F.lit(dfull) if full_c is None else full_c.otherwise(dfull)
    thr_c = F.lit(dthr) if thr_c is None else thr_c.otherwise(dthr)
    ncopies_c = F.lit(dn) if ncopies_c is None else ncopies_c.otherwise(dn)

    bucket = hash_bucket(F.col(key_col).cast("string"))
    return (df
            .withColumn("epoch",
                        F.explode(F.sequence(F.lit(0), ncopies_c - 1)))
            .filter((F.col("epoch") < full_c) |
                    ((F.col("epoch") == full_c) & (bucket < thr_c)))
            .withColumn("epoch", F.col("epoch").cast("long")))


def quality_quantile_gate(df: DataFrame, keep_pct: int = 50,
                          group_col: str = "source",
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Per-source relative quality gate: keep the top `keep_pct` percent
    of EACH source by quality (unique-token ratio, ties by id) — the
    curation move that raises corpus quality without shifting the
    source mix, where a single absolute threshold would gut noisy
    sources and keep low-information boilerplate from clean ones.
    Complements cap_per_group (absolute count quota) and
    mixture_sample (token-budget mix).

    Determinism: rank = row_number over (uniq_ratio desc, id) — the
    ratio is a rounded-at-4 division of exact integers (text.
    quality_score) and id breaks ties totally; the cut is the exact
    integer ceil rn <= (cnt * keep_pct + 99) div 100, so engine replay
    is bit-exact (no float quantile).

    Scale: one window per source — the single-sorted-partition-per-
    group bound; at corpora where a source exceeds one partition, swap
    in the hash-sampled cut-point construction of
    text.ccnet_buckets_sampled (same rank arithmetic on a sample,
    broadcast threshold) — this exact tier stays the validation path.

    Output (id, group, n_tokens, uniq_ratio, q_rank, n_source) for the
    KEPT docs only."""
    from pyspark.sql import Window

    from .text import quality_score

    q = quality_score(df, id_col=id_col, text_col=text_col) \
        .join(df.select(id_col, group_col), id_col)
    w = Window.partitionBy(group_col).orderBy(
        F.desc("uniq_ratio"), F.asc(id_col))
    wc = Window.partitionBy(group_col)
    ranked = q.select(
        id_col, group_col, "n_tokens", "uniq_ratio",
        F.row_number().over(w).cast("long").alias("q_rank"),
        F.count(F.lit(1)).over(wc).cast("long").alias("n_source"))
    cut = F.expr("(n_source * %d + 99) div 100" % keep_pct)
    return ranked.filter(F.col("q_rank") <= cut)

def temperature_mixture(df: DataFrame, budget_tokens: int,
                        alpha: float = 0.5,
                        id_col: str = "doc_id",
                        source_col: str = "source",
                        text_col: str = "text") -> DataFrame:
    """Temperature-weighted corpus mixing (the UniMax / multilingual-LM
    sampling rule): source weights are DERIVED from the data as
    w_s = (total_tokens_s)^alpha instead of hand-specified as in
    mixture_sample. alpha=1 reproduces natural proportions, alpha->0
    flattens toward uniform — the standard knob for upweighting
    low-resource sources without a per-source weight table.

    fraction_s = min(1, (w_s / sum_t w_t) * budget_tokens / tokens_s),
    applied as the same partition-layout-independent hash threshold as
    hash_sample, so the sampled doc set is reproducible across runs,
    repartitions, and engines.

    Cross-engine determinism: general pow(x, alpha) is NOT guaranteed
    correctly rounded, so `alpha` is restricted to {0.25, 0.5, 0.75, 1}
    and computed as sqrt/multiply chains (each IEEE-correctly-rounded,
    hence bit-identical in any engine): t^0.5 = sqrt(t),
    t^0.25 = sqrt(sqrt(t)), t^0.75 = sqrt(t)*sqrt(sqrt(t)). Weights are
    rounded at 9 and summed in DECIMAL(38,9) (order-independent exact);
    the final threshold is one left-associated double expression
    floor(w * B * 10000 / W / t) with identical operand order in the
    oracle. Empty sources (0 tokens) get threshold 0 via an explicit
    guard — under ANSI mode an unguarded /0 would kill the job.

    Scale: per-source totals are one map-side-combinable aggregate
    (sources are few), broadcast back; the keep filter is narrow — the
    corpus never shuffles. Output (id, source, n_tokens) of kept docs.
    """
    chains = {
        1.0: lambda t: t.cast("double"),
        0.5: lambda t: F.sqrt(t),
        0.25: lambda t: F.sqrt(F.sqrt(t)),
        0.75: lambda t: F.sqrt(t) * F.sqrt(F.sqrt(t)),
    }
    if alpha not in chains:
        raise ValueError(
            f"alpha must be one of {sorted(chains)} (sqrt-chain-"
            f"expressible, engine-reproducible), got {alpha}")
    n_tokens = F.greatest(
        F.lit(0),
        F.coalesce(F.size(F.split(F.trim(F.col(text_col)), r"\s+")),
                   F.lit(0))).cast("long")
    with_t = df.select(F.col(id_col), F.col(source_col),
                       n_tokens.alias("n_tokens"))
    totals = with_t.groupBy(source_col).agg(
        F.sum("n_tokens").alias("__total"))
    weighted = totals.withColumn(
        "__w", F.round(chains[alpha](F.col("__total")), 9)
                .cast("decimal(38,9)"))
    wsum = weighted.agg(F.sum("__w").alias("__wsum"))
    rates = weighted.crossJoin(F.broadcast(wsum))
    threshold = F.when(
        (F.col("__total") > 0) & (F.col("__wsum") > 0),
        F.least(
            F.lit(_M).cast("long"),
            F.floor(F.col("__w").cast("double")
                    * F.lit(float(budget_tokens)) * F.lit(float(_M))
                    / F.col("__wsum").cast("double")
                    / F.col("__total")))).otherwise(F.lit(0)) \
        .alias("__thr")
    rates = rates.select(source_col, threshold)
    return (with_t.join(F.broadcast(rates), source_col)
            .filter(hash_bucket(F.col(id_col).cast("string"))
                    < F.col("__thr"))
            .select(id_col, source_col, "n_tokens"))


def token_budget_cap(df: DataFrame, budget_tokens: int,
                     group_col: str = "source", id_col: str = "doc_id",
                     text_col: str = "text",
                     tokens_col: str | None = None) -> DataFrame:
    """Per-group TOKEN budget (vs cap_per_group's doc-count quota):
    within each group, walk documents in portable-hash order and keep
    them while the running token total stays <= `budget_tokens` — the
    knob a mixture recipe actually specifies ("20B tokens of web, 5B of
    code"), where doc-count caps misallocate because doc lengths differ
    across sources. The hash walk order makes the kept PREFIX
    deterministic across runs, partitionings, and engines, and
    decorrelated from crawl order (same discipline as
    cap_per_group(shuffle_order=True)).

    A doc is kept iff the cumulative token count INCLUDING it is within
    budget (strict: the output never exceeds the budget; a doc longer
    than the remaining headroom is skipped along with everything after
    it rather than overshooting). Cumulative sum is a running window of
    bigint token counts — integer-exact, no float anywhere.

    Scale: ONE shuffle on the group key, then a running-sum window per
    group. Groups are sources (few, large): each source's window is a
    per-partition scan after the sort — same cost shape as the exact
    ccnet_buckets tier, and like it, the per-group sort bound is the
    documented cost of exact prefix semantics. For astronomically large
    single sources, sample token-count cutpoints first (the
    ccnet_buckets_sampled recipe) and hash-filter to the estimated
    rate; this exact tier is the verification configuration.

    Output (`id_col`, `group_col`, n_tokens, cum_tokens) of kept docs.
    Pass `tokens_col` to reuse an already-computed token count (e.g.
    when composing after temperature_mixture, whose output carries
    n_tokens — skips re-tokenizing the text).
    """
    from pyspark.sql import Window

    n_tokens = (F.col(tokens_col).cast("long") if tokens_col else
                F.greatest(
                    F.lit(0),
                    F.coalesce(F.size(F.split(F.trim(F.col(text_col)),
                                              r"\s+")),
                               F.lit(0))).cast("long"))
    with_t = df.select(F.col(id_col), F.col(group_col),
                       n_tokens.alias("n_tokens"))
    w = (Window.partitionBy(group_col)
         .orderBy(portable_hash(F.col(id_col).cast("string")),
                  F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (with_t
            .withColumn("cum_tokens", F.sum("n_tokens").over(w))
            .filter(F.col("cum_tokens") <= F.lit(int(budget_tokens)))
            .select(id_col, group_col, "n_tokens", "cum_tokens"))


def dedup_weighted_sample(df: DataFrame, cluster_col: str,
                          key_col: str = "doc_id",
                          target_copies: float = 1.0) -> DataFrame:
    """Duplicate-downweighted sampling (the SlimPajama/soft-dedup
    recipe): each row survives with probability ~target_copies/
    cluster_size, so a duplicate cluster contributes ~target_copies
    documents in expectation instead of all its copies — downweighting
    repeated content without the hard keep-exactly-one rule (which
    over-prunes when duplication itself carries signal).

    The keep rule is INTEGER-exact and engine-portable:
    `hash_bucket(key) * cluster_size < _M * target_copies` — no float
    division, deterministic per key, partition-independent (the same
    doc survives on any cluster layout or rerun).

    Shape: one window count over the cluster key (a single exchange —
    clusters are hash-uniform digests, skew-free) + a narrow filter.
    The text never moves twice: at 100 TB run it on (key, cluster)
    fingerprint pairs and semi-join the survivors back, like
    exact_dedup does.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(cluster_col)
    thresh = int(round(_M * target_copies))
    return (df.withColumn("__cs", F.count(F.lit(1)).over(w).cast("long"))
            .filter(hash_bucket(F.col(key_col).cast("string")) *
                    F.col("__cs") < F.lit(thresh))
            .drop("__cs"))


def split_by_cluster(df: DataFrame, cluster_col: str,
                     splits: Mapping[str, float] | None = None,
                     out_col: str = "split") -> DataFrame:
    """Leakage-safe train/val/test assignment: split on the DUPLICATE-
    CLUSTER id, not the document id, so near-duplicates can never land
    on opposite sides of the boundary (doc-grain splitting leaks eval
    content into training whenever a near-dup pair straddles the cut —
    the contamination mode assign_splits alone cannot prevent).

    Thin composition: `assign_splits` keyed on `cluster_col` — the
    cluster id comes from upstream components
    (`dedup.connected_components*` over near-dup pairs) or a content
    fingerprint. Same narrow no-shuffle projection, same contiguous
    hash-range determinism.
    """
    return assign_splits(df, cluster_col, splits, out_col)


def quantile_normalize(df: DataFrame, value_col: str,
                       group_col: str = "source",
                       id_col: str = "doc_id") -> DataFrame:
    """Cross-group quantile normalization: map each group's value
    distribution onto the GLOBAL distribution by rank — the calibration
    step before one absolute threshold can gate scores produced on
    different scales per source (a classifier that runs "hot" on one
    domain otherwise monopolizes any global cut; after normalization,
    equal within-source rank means equal calibrated value, so the
    threshold selects the same per-source fraction everywhere).

    The rank->global-index map is INTEGER-exact:
    gidx = 1 + ((rank_g - 1) * (N - 1)) div (n_g - 1) — group
    endpoints land on the global min/max, singleton groups on the
    global median (N + 1) div 2; no float quantile arithmetic, so the
    whole map replays bit-for-bit in SQL.

    Shape: one window per group (rank + count), ONE range exchange for
    the global order (`layout.global_row_number`, never a
    single-partition window), a 1-row total broadcast, and an
    equi-join on the integer index. Values stream; only (id, value)
    pairs shuffle.
    """
    from pyspark.sql import Window

    from .layout import global_row_number

    base = df.select(F.col(id_col), F.col(group_col), F.col(value_col))
    lookup = (global_row_number(base, [value_col, id_col],
                                id_alias="__tgt")
              .select("__tgt", F.col(value_col).alias("calibrated")))
    tot = base.agg(F.count(F.lit(1)).cast("long").alias("__tot"))
    wg = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc())
    wc = Window.partitionBy(group_col)
    ranked = (base
              .withColumn("__r", F.row_number().over(wg).cast("long"))
              .withColumn("__n", F.count(F.lit(1)).over(wc).cast("long"))
              .crossJoin(F.broadcast(tot)))
    tgt = F.when(F.col("__n") > 1,
                 F.expr("1L + ((__r - 1L) * (__tot - 1L)) div (__n - 1L)")) \
           .otherwise(F.expr("(__tot + 1L) div 2L"))
    return (ranked.withColumn("__tgt", tgt)
            .join(lookup, "__tgt")
            .select(F.col(id_col), F.col(group_col),
                    F.col(value_col).alias("raw"), F.col("calibrated")))
