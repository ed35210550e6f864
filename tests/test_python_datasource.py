"""Python DataSource API test: the REST source consumed through
spark.read.format("rest_json") with an injected offline fetcher."""

import json

import pyspark.sql.functions as F
import pytest

from sanef_election_dashboard_etl_spark.plans.pipelines import BALLOT_SCHEMA
from sanef_election_dashboard_etl_spark.sources import python_datasource as PDS


def _fake(url: str) -> str:
    ward = url.rsplit("/", 1)[-1]
    if ward == "W404":
        raise KeyError("no such ward")
    return json.dumps({
        "WardID": ward,
        "PartyBallotResults": [{"Name": "ANC", "TotalValidVotes": 10}]})


def test_rest_datasource_roundtrip(spark):
    spark.dataSource.register(PDS.RestJsonDataSource)
    df = (spark.read.format("rest_json")
          .option("url_template", "https://api.test/ward/{}")
          .option("keys", "W1,W2,W404")
          .option("num_partitions", "2")
          .option("fetcher_pickle", PDS.fetcher_option(_fake))
          .load())
    parsed = df.withColumn("p", F.from_json("payload", BALLOT_SCHEMA))
    got = {r["key"]: r for r in parsed.collect()}
    assert got["W1"]["p"]["WardID"] == "W1"
    assert got["W1"]["error"] is None
    assert got["W2"]["p"]["PartyBallotResults"][0]["TotalValidVotes"] == 10
    assert got["W404"]["payload"] is None
    assert "KeyError" in got["W404"]["error"]


def test_rest_datasource_partition_slicing():
    r = PDS.RestJsonReader({"url_template": "u/{}",
                            "keys": "a,b,c,d,e", "num_partitions": "2"})
    parts = r.partitions()
    assert len(parts) == 2
    assert sorted(k for p in parts for k in p.keys) == ["a", "b", "c", "d", "e"]


def test_rest_streaming_datasource_polls(spark, tmp_path):
    """Streaming REST poller: each micro-batch re-fetches the key set —
    the reference's cron loop as a first-class stream source."""
    spark.dataSource.register(PDS.RestJsonStreamingDataSource)
    stream = (spark.readStream.format("rest_json_stream")
              .option("url_template", "https://api.test/ward/{}")
              .option("keys", "W1,W2")
              .option("max_polls", "2")
              .option("fetcher_pickle", PDS.fetcher_option(_fake))
              .load())
    q = (stream.writeStream.format("memory").queryName("polls")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True)
         .start())
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = spark.sql("SELECT poll, key, payload IS NOT NULL AS ok FROM polls") \
               .collect()
    seen = sorted({(r["poll"], r["key"], r["ok"]) for r in got})
    assert (0, "W1", True) in seen and (0, "W2", True) in seen


def test_dashboard_upload_writer_sink(spark, tmp_path):
    """df.write.format('dashboard_upload') posts ONE multipart CSV built
    from the partition's rows; the injected poster records what was sent."""
    out = tmp_path / "posted.json"

    def poster(url, csv_bytes, filename, meta, token):
        out.write_text(json.dumps({
            "url": url, "csv": csv_bytes.decode(), "filename": filename,
            "meta": {k: str(v) for k, v in meta.items()}, "token": token}))
        return 200

    spark.dataSource.register(PDS.DashboardUploadDataSource)
    df = spark.createDataFrame([("Hung", 3), ("Outright", 7)],
                               "Councils string, Count long")
    (df.coalesce(1).write.format("dashboard_upload")
       .option("endpoint", "https://dash.test")
       .option("dataset_id", "42")
       .option("token", "sekrit")
       .option("poster_pickle", PDS.poster_option(poster))
       .mode("append").save())
    rec = json.loads(out.read_text())
    assert rec["url"] == "https://dash.test/api/v1/datasets/42/upload/"
    assert rec["csv"].splitlines()[0] == "Councils,Count"
    assert set(rec["csv"].splitlines()[1:]) == {"Hung,3", "Outright,7"}
    assert rec["token"] == "sekrit"
    assert rec["meta"] == {"update": "True", "overwrite": "True"}
    assert rec["filename"].startswith("dataset-")


def test_dashboard_upload_rejects_multi_partition(spark, tmp_path):
    def poster(url, csv_bytes, filename, meta, token):
        return 200

    spark.dataSource.register(PDS.DashboardUploadDataSource)
    df = spark.createDataFrame([(i,) for i in range(100)], "v long") \
              .repartition(4)
    with pytest.raises(Exception, match="single partition|coalesce"):
        (df.write.format("dashboard_upload")
           .option("endpoint", "https://dash.test")
           .option("dataset_id", "1")
           .option("poster_pickle", PDS.poster_option(poster))
           .mode("append").save())
