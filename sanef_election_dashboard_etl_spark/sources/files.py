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
