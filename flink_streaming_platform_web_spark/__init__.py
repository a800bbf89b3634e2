"""PySpark-native analytics engine with the query and data-processing
capabilities of ``bestzhuyuan/flink-streaming-platform-web``.

The reference is a SQL-job platform delegating operator semantics to
Flink SQL 1.13 (see /root/repo/SURVEY.md). This package re-expresses
both layers Spark-first:

- **engine layer**: Spark SQL + Structured Streaming (DataFrame API,
  ``spark.sql``, ``readStream``/``writeStream``, watermarks, windows,
  ``foreachBatch`` upsert/CDC sinks).
- **platform layer**: SQL-script parsing/classification/validation,
  connector DDL interpretation, job lifecycle, monitoring.

Plus first-class large-scale training-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis).
"""

__version__ = "0.1.0"

from flink_streaming_platform_web_spark.session import get_spark  # noqa: F401
