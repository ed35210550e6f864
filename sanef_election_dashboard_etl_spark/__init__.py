"""sanef_election_dashboard_etl_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL (OpenUpSA/sanef-election-dashboard-etl, surveyed in
/root/repo/SURVEY.md), re-expressed Spark-first: declarative DataFrame plans
optimized by Catalyst, executed by Tungsten, designed for 100 TB scale even
though tests run on local[*].

Layout:
    session.py      SparkSession builder (AQE, Arrow, UTC, broadcast tuning)
    catalog.py      named-table loading over the parquet fixtures
    functions/      cross-engine-deterministic column helpers (decimal sums, maps)
    operators/      the operator library (SURVEY.md §2): relational, text,
                    dedup, similarity, multimodal
    sources/        CSV/JDBC/REST/literal sources (SURVEY.md §2.1)
    sinks.py        CSV + HTTP-upload sink adapters
    plans/          the nine reference pipelines as DataFrame DAGs (§2.12)
    streaming/      Structured Streaming variants (§2.10 extension)
    queries.py      the driver-facing registry: name -> (spark fn, oracle SQL)
"""

__version__ = "0.1.0"
