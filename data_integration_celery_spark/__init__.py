"""data_integration_celery_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query / data-processing capabilities of
``DataIntegrationAlliance/data_integration_celery`` (a Celery+pandas+MySQL
financial-data ETL system) as an idiomatic Spark DataFrame engine, plus the
large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) such an engine needs at 100 TB scale.

Layout
------
- ``session``     SparkSession factory tuned for the engine
- ``catalog``     table registry / typed loaders for the test star schema
- ``functions``   scalar/merge-kernel expression libraries (no Python UDFs)
- ``operators``   relational + analytical operators (upsert, as-of, bars,
                  continuous contracts, dedup, similarity, text, quality)
- ``sources``     batch sources (parquet/csv/jdbc/vendor-connector pattern)
- ``sinks``       exports (csv, per-key fan-out, replication)
- ``streaming``   Structured Streaming jobs (tick→bar, stateful dedup)
- ``plans``       minimal DAG runner replacing the reference's Celery chains
"""

__version__ = "0.1.0"
