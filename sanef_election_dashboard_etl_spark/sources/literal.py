"""Literal single-row source (SURVEY.md §2.1 S10).

Every reference pipeline has a RESET_DATASET=='reset' branch that uploads
one placeholder row (SANEF_Uploader.py:96-103, :157-164, ...). Engine
equivalent: a one-row DataFrame with the pipeline's output schema."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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


def reset_rows(spark: SparkSession, contract: str) -> DataFrame:
    """One placeholder row for the named output contract (FIXTURES.md §3)."""
    rows, schema = RESET_ROWS[contract]
    return spark.createDataFrame(rows, schema)
