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
