"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``sanef_election_dashboard_etl_spark``; the
registry (queries.py) carries every SURVEY.md §2 operator id plus the
§7 extension operators (dedup / similarity / text / multimodal /
event windows), each with its DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from sanef_election_dashboard_etl_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the hung_councils pipeline
    analog (scan -> broadcast join -> recode -> fused agg -> stack)."""
    return REGISTRY["pipe_hung_councils"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §7)."""
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle}
