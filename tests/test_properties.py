"""Property tests (SURVEY.md §5.2 layer 4) with hypothesis-generated
inputs: algebraic invariants the reference semantics imply."""

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sanef_election_dashboard_etl_spark.operators import relational as R

SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=list(HealthCheck))

flags = st.lists(
    st.tuples(st.sampled_from(["EC", "FS", "GT"]), st.integers(0, 1)),
    min_size=1, max_size=25)


@given(data=flags)
@SLOW
def test_hung_plus_outright_equals_total(spark, data):
    """R2 invariant (SANEF_Uploader.py:239-247): per group,
    Hung + Outright Majority == total councils."""
    df = spark.createDataFrame(data, "g string, hung int")
    agg = R.grouped_sum_count(df, ["g"], F.col("hung"), "hung", "total")
    stacked = R.stack_pairs(agg, ["g"],
                            [("Hung", F.col("hung")),
                             ("Outright Majority", F.col("total") - F.col("hung"))],
                            "Councils", "Count")
    recombined = (stacked.groupBy("g").agg(F.sum("Count").alias("s"))
                  .join(agg, "g"))
    assert recombined.filter(F.col("s") != F.col("total")).count() == 0
    # stack multiplies rows by k
    assert stacked.count() == 2 * agg.count()


keys = st.lists(st.integers(0, 30), min_size=1, max_size=40)


@given(left=keys, right=keys)
@SLOW
def test_anti_semi_partition(spark, left, right):
    """J4 invariant: semi ⊎ anti == left, for arbitrary key multisets."""
    ldf = spark.createDataFrame([(k,) for k in left], "k int")
    rdf = spark.createDataFrame([(k,) for k in right], "k int")
    semi = R.semi_join(ldf, rdf, "k")
    anti = R.anti_join(ldf, rdf, "k")
    assert semi.count() + anti.count() == len(left)
    assert sorted(r["k"] for r in semi.unionByName(anti).collect()) == \
        sorted(left)


@given(data=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)),
                     min_size=1, max_size=30))
@SLOW
def test_dedup_keep_first_minimality(spark, data):
    """A8 invariant: exactly one row per key, and it is the ordered-first."""
    df = spark.createDataFrame(data, "k int, v int")
    out = R.dedup_keep_first(df, ["k"], [F.col("v").asc(), F.col("k").asc()])
    got = {r["k"]: r["v"] for r in out.collect()}
    expect = {}
    for k, v in data:
        expect[k] = min(expect.get(k, v), v)
    assert got == expect


@given(texts=st.lists(
    st.text(alphabet="ab c", min_size=1, max_size=30), min_size=2, max_size=8))
@SLOW
def test_jaccard_bounds_and_identity(spark, texts):
    """Jaccard pairs: 0 < j <= 1 always; j == 1.0 exactly for documents
    with identical token sets."""
    from sanef_election_dashboard_etl_spark.operators import dedup as D
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    pairs = D.ngram_jaccard_pairs(docs, n=1, min_jaccard=0.0).collect()
    for r in pairs:
        assert 0.0 < r["jaccard"] <= 1.0
    # identical-token-set pairs must appear with jaccard 1.0
    def tokset(t):
        return frozenset(t.split())
    same = [(a, b) for a in range(len(texts)) for b in range(a + 1, len(texts))
            if tokset(texts[a]) == tokset(texts[b]) and tokset(texts[a])]
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    for a, b in same:
        assert got.get((a, b)) == 1.0


@given(n_dup=st.integers(2, 4))
@SLOW
def test_minhash_never_misses_identical_docs(spark, n_dup):
    """LSH candidate generation can miss near-dups, but identical documents
    have identical signatures in every band — they can never be missed."""
    from sanef_election_dashboard_etl_spark.operators import dedup as D
    docs = [(i, "alpha beta gamma delta epsilon zeta") for i in range(n_dup)]
    docs += [(100, "totally different words entirely here now")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"])
             for r in D.minhash_lsh_pairs(df, n=1, k=16, bands=4,
                                          min_jaccard=0.99).collect()}
    for a in range(n_dup):
        for b in range(a + 1, n_dup):
            assert (a, b) in pairs
