"""File sources (SURVEY.md §2.1 S1, plus parquet).

The reference reads its dimension CSVs with inferred schemas
(SANEF_Uploader.py:33-36) — the engine is schema-explicit: every CSV gets
a declared StructType, because inference is the reference's biggest
correctness hazard (SURVEY.md §1.2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv_dim(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """S1: header CSV with explicit schema (no inference pass — a full
    extra scan at 100 TB)."""
    return (spark.read.schema(schema)
            .option("header", True)
            .option("mode", "FAILFAST")
            .csv(path))


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType,
               permissive: bool = False) -> DataFrame:
    """Schema-explicit JSONL (newline-delimited JSON) ingest — the
    interchange format training-data pipelines exchange corpora in.
    Same discipline as read_csv_dim: a DECLARED schema, because
    inference costs a full extra scan at 100 TB and silently widens
    types between drops. FAILFAST by default (a dim/corpus load should
    die loudly); `permissive=True` is the crawled-feed mode — malformed
    lines land whole in `_corrupt_record` instead of killing the job,
    mirroring the PERMISSIVE CSV path (COVERAGE.md corrupt-record row).
    JSONL is splittable line-by-line, so a directory of .jsonl files
    parallelizes like CSV; pair with sinks.write_jsonl for round-trip
    export."""
    from pyspark.sql.types import StringType

    if permissive:
        schema = StructType(list(schema.fields)).add(
            "_corrupt_record", StringType())
        return (spark.read.schema(schema)
                .option("mode", "PERMISSIVE")
                .option("columnNameOfCorruptRecord", "_corrupt_record")
                .json(path))
    return (spark.read.schema(schema)
            .option("mode", "FAILFAST")
            .json(path))
