"""PySpark-native analytics engine with the capabilities of
AbdulSohail018/Autonomous-Orchestrator-Ai (reference at /root/reference,
read-only), rebuilt Spark-first.

The reference is a self-healing streaming ETL pipeline
(Kafka -> Spark Structured Streaming -> Parquet/Snowflake) with declarative
data-quality expectations and an autonomous decision agent. This package
re-expresses that operator surface as a clean, composable, batch+streaming
PySpark library:

- ``sources``    readers/writers (parquet, json, kafka, quarantine split-write)
- ``functions``  scalar/column expression layer (temporal, enrichment, text)
- ``operators``  DataFrame -> DataFrame operators (transform pipeline, DQ
                 expectation engine, run report, incidents, dedup, similarity,
                 multimodal plumbing)
- ``plans``      full analytic queries (used by __spark_entry__ and bench.py)
- ``streaming``  structured-streaming wrappers (watermark, windowed aggs,
                 bounded runs, foreachBatch sinks)
- ``agent``      rule-based decision contract + remediation tools

Every operator is built from built-in Column expressions (Catalyst-
optimizable, whole-stage-codegen friendly); Python UDFs appear only where
semantics genuinely require them (Arrow-batched, never row-at-a-time).
"""

__version__ = "0.1.0"

from autonomous_orchestrator_ai_spark.session import get_spark  # noqa: F401
