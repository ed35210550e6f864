"""Named-table catalog over the parquet fixtures.

The reference loads its two dimension CSVs eagerly at module import
(SANEF_Uploader.py:33-36) and pulls facts ad hoc through pyodbc cursors.
Here every table is a lazily-scanned DataFrame resolved by name from a
scale-factor directory (TESTDATA.md): Catalyst prunes columns and pushes
filters into the parquet scan, so "load" costs nothing until an action runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One named table as a lazy parquet scan.

    `events.ts` normalizes to session-zoned TimestampType (UTC) whatever
    the fixture's physical encoding — testdata generations have shipped
    both TIMESTAMP(NANOS) (arrives as long nanos under
    `spark.sql.legacy.parquet.nanosAsLong`, set by session.tune; integer
    `div` to micros — epoch nanos exceed double's 2^53 exact-integer
    range) and TIMESTAMP(MICROS, isAdjustedToUTC=false) (arrives as
    TIMESTAMP_NTZ; reinterpreted as UTC instants, matching how the DuckDB
    oracle treats the same naive values)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.to_timestamp(F.col("ts")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` works alongside
    the DataFrame API (same names the DuckDB oracle uses)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
