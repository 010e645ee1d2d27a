"""mlops_realtime_data_ingestion_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame / SQL / Structured Streaming)
engine reproducing the query and data-processing capabilities of the
reference pipeline ``amanoxsolutions/mlops-realtime-data-ingestion``
(AWS CDK + Fargate poller + Lambda dedup + PyFlink 1-min windowed
aggregation + SageMaker Feature Store + Glue compaction), re-expressed
Spark-first and extended with large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing).

Layout
------
- ``session``    : SparkSession builder tuned for local[32] tests and
                   cluster-scale defaults (AQE, shuffle partitions).
- ``schemas``    : explicit StructTypes for the transaction stream and
                   the windowed aggregate record.
- ``sources``    : batch parquet loaders + file-backed streaming sources.
- ``operators``  : ingest/dedup, event-time windows, relational recipes,
                   time-series splits, fuzzy dedup, similarity search,
                   text analysis, multimodal plumbing.
- ``functions``  : scalar function catalog and forecast-evaluation
                   metrics (RMSE, weighted quantile loss).
- ``streaming``  : the continuous pipeline (dedup -> window -> upsert),
                   a parquet-backed feature store, monitoring/alarms.
- ``plans``      : the query registry consumed by ``__spark_entry__``.
"""

__version__ = "0.1.0"
