"""Literal sources (SURVEY.md §2.1 S10) — tiny in-plan row sets.

Every reference pipeline has a RESET_DATASET=='reset' branch that uploads
one placeholder row (SANEF_Uploader.py:96-103, :157-164, ...). Engine
equivalent: a one-row DataFrame with the pipeline's output schema.

`values_df` is the REQUIRED constructor for any literal rows that sit on
a query path (r11 optimization): `spark.createDataFrame(local_rows)`
parallelizes the rows into `defaultParallelism` RDD slices and every
action that touches the subtree runs one Python worker round trip PER
SLICE just to unpickle a (mostly empty) partition — measured 0.28-0.31s
per execution for a 9-row literal on local[32] vs 0.03s for the same
rows as a SQL VALUES clause, and a broadcast-consumed literal re-executes
per action. The VALUES form plans as LocalTableScan: pure JVM, zero
Python workers, zero scan tasks when feeding a BroadcastExchange (the
rows are shipped from the driver directly). Same guide-§4 boundary rule
as the lsh_bucket plane constants: one parsed SQL text literal, never
O(n) py4j/pickle round trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (ArrayType, BooleanType, DataType, DoubleType,
                               FloatType, StringType, StructType)

RESET_ROWS = {
    "geo_party_count": ([("None", "-", 0)], "Geography string, Party string, Count long"),
    # councils_won_by_party's reset row uses 'Party Name', unlike its
    # sibling pipelines' 'Party' (SANEF_Uploader.py:309-317).
    "geo_party_name_count": ([("None", "-", 0)],
                             "Geography string, `Party Name` string, Count long"),
    "geo_contents": ([("None", "-")], "Geography string, Contents string"),
    "geo_councils_count": ([("None", "-", 0)], "Geography string, Councils string, Count long"),
    # seats_won's reset row pins Seat Type to 'Ward' (SANEF_Uploader.py:561-568).
    "geo_party_seat_count": ([("None", "-", "Ward", 0)],
                             "Geography string, `Party Name` string, `Seat Type` string, Count long"),
    "geo_turnout_count": ([("None", "-", 0)],
                          "Geography string, `Voter Turnout` string, Count long"),
}


def _sql_lit(v, dt: DataType) -> str:
    """Render one Python value as a Spark SQL literal of type `dt`."""
    if v is None:
        return f"CAST(NULL AS {dt.simpleString()})"
    if isinstance(dt, ArrayType):
        inner = ", ".join(_sql_lit(x, dt.elementType) for x in v)
        return f"array({inner})" if inner else \
            f"CAST(array() AS {dt.simpleString()})"
    if isinstance(dt, StringType):
        s = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"
    if isinstance(dt, (DoubleType, FloatType)):
        # repr(float) round-trips the double exactly (house rule:
        # similarity.lsh_bucket plane constants)
        return f"CAST('{float(v)!r}' AS {dt.simpleString()})"
    if isinstance(dt, BooleanType):
        return "true" if v else "false"
    # integral types: emit digits, cast in the projection below
    return str(v)


def values_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Literal DataFrame via one SQL VALUES clause (LocalTableScan).

    Drop-in for `spark.createDataFrame(rows, schema)` on QUERY PATHS:
    identical schema and values (each column CAST to its declared type),
    but planned as LocalTableScan instead of a Python-RDD scan — no
    Python workers, no 32-slice parallelize (see module docstring for
    the measured 10x). `schema` is a DDL string ("name type, ...";
    backtick names with spaces)."""
    st = StructType.fromDDL(schema)
    tuples = ", ".join(
        "(" + ", ".join(_sql_lit(v, f.dataType)
                        for v, f in zip(row, st.fields)) + ")"
        for row in rows)
    # IF(true, x, NULL) keeps every column nullable=True at analysis time
    # (exact createDataFrame parity) and folds to x in the optimizer —
    # zero runtime cost, no schema drift for downstream unionByName
    proj = ", ".join(
        f"IF(true, CAST(col{i + 1} AS {f.dataType.simpleString()}), NULL)"
        f" AS `{f.name}`"
        for i, f in enumerate(st.fields))
    return spark.sql(f"SELECT {proj} FROM VALUES {tuples}")


def reset_rows(spark: SparkSession, contract: str) -> DataFrame:
    """One placeholder row for the named output contract (FIXTURES.md §3)."""
    rows, schema = RESET_ROWS[contract]
    return values_df(spark, rows, schema)
