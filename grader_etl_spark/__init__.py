"""grader_etl_spark — a PySpark-native analytics engine.

Re-expresses every data operation of the reference ETL pipeline
(V3arubina/grader-etl, read-only at /root/reference) as first-class,
Catalyst-optimized Spark operators, and extends it with the
relational + LLM-data-pipeline operator set a 100 TB training-data
platform needs (dedup, similarity search, text analysis, multimodal
columns).

Layout
------
- ``session``    : SparkSession factory (AQE on, UTC, Arrow on)
- ``io``         : parquet table loader for the driver fixtures
- ``registry``   : query registry — the single source of truth wiring
                   every operator to its DuckDB oracle SQL twin
- ``operators/`` : relational operators (SURVEY.md §2 inventory)
- ``functions/`` : column-level function library (text, vectors, json)
- ``sources/``   : batch/streaming sources (REST-landed JSON, parquet)
- ``sinks/``     : JDBC / sheets / email sink adapters (externals stubbed)
- ``plans/``     : pipeline assembly (the reference pipeline, Spark-first)
- ``streaming/`` : Structured Streaming rendition of the pipeline
"""

__version__ = "0.1.0"
