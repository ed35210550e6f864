"""JDBC option-contract tests (no driver in container — SURVEY §7 risk a:
the source boundary is testable without the network) and the
applyInPandasWithState streaming round trip."""

import pytest

from sanef_election_dashboard_etl_spark.sources.jdbc import JdbcSource


def _src():
    return JdbcSource("jdbc:sqlserver://db;databaseName=LED", user="u",
                      password="p", driver="com.microsoft.sqlserver.jdbc.SQLServerDriver")


def test_jdbc_table_options():
    opts = _src().reader_options(dbtable="PCR_Party")
    assert opts["dbtable"] == "PCR_Party"
    assert opts["url"].startswith("jdbc:sqlserver://")
    assert opts["fetchsize"] == "10000"


def test_jdbc_partitioned_read_options():
    opts = _src().reader_options(dbtable="LED_GIS_CouncilWinners",
                                 partition_on="pklCouncilWinnerID",
                                 lower=0, upper=1_000_000, num_partitions=64)
    assert opts["partitionColumn"] == "pklCouncilWinnerID"
    assert opts["numPartitions"] == "64"


def test_jdbc_option_validation():
    with pytest.raises(ValueError):
        _src().reader_options()
    with pytest.raises(ValueError):
        _src().reader_options(dbtable="t", query="SELECT 1")
    with pytest.raises(ValueError):
        _src().reader_options(dbtable="t", partition_on="id")


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """Two micro-batches through applyInPandasWithState: state carries the
    first batch's totals into the second."""
    from sanef_election_dashboard_etl_spark.streaming.stateful import running_totals

    src = tmp_path / "src"
    src.mkdir()
    schema = "event_id long, event_type string, value double"
    b1 = spark.createDataFrame([(1, "click", 1.0), (2, "view", 5.0)], schema)
    b1.coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1").parquet(str(src))
    q = (running_totals(stream).writeStream.format("memory")
         .queryName("running").outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
        b2 = spark.createDataFrame([(3, "click", 2.0)], schema)
        b2.coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM running").collect()
        latest = {}
        for r in rows:  # update mode appends; last write per key wins
            latest[r["event_type"]] = (r["n_events"], r["total_value"])
        assert latest["click"] == (2, 3.0)
        assert latest["view"] == (1, 5.0)
    finally:
        q.stop()
