"""Run-report metrics (reference A1/A7/S6 + severity classifier D12).

Reference: /root/reference/spark/jobs/ingest_transform.py:307-336 (the
conditional-count aggregate + JSON report) — note the reference computes this
with ``.agg().collect()`` on a *streaming* DataFrame after the stream stops,
which is unsupported (SURVEY.md §3.2 defect). Here:

- batch: ``run_report_agg`` (one hash-aggregate job; map-side partial
  aggregation makes it a single reduce of 4 longs per partition — constant
  network cost at any scale), or
- streaming: ``observed_metrics`` wires the same expressions through
  ``df.observe`` so metrics accumulate per micro-batch with zero extra jobs
  (see streaming.pipeline).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.functions.temporal import WATERMARK_DELAY

#: Decision thresholds (reference agent/decision_agent.py:63-70;
#: airflow/include/config.yml:46-49).
LATE_ARRIVAL_THRESHOLD = 0.15
DQ_FAILURE_THRESHOLD = 0.05


def _report_metric_columns() -> list[Column]:
    """The A1 conditional counts (ingest_transform.py:310-316)."""
    return [
        F.count(F.lit(1)).alias("total_records"),
        F.count(F.when(F.col("is_late_arrival") == True, 1)).alias("late_records"),  # noqa: E712
        F.count(F.when(F.col("dq_passed") == False, 1)).alias("dq_failures"),  # noqa: E712
        F.count(F.when(F.col("schema_drift_detected") == True, 1)).alias(  # noqa: E712
            "schema_drift_count"
        ),
    ]


def run_report_agg(df: DataFrame) -> DataFrame:
    """Global conditional-count aggregate -> 1-row DataFrame (reference A1)."""
    return df.agg(*_report_metric_columns())


def observed_metrics(df: DataFrame, name: str = "run_stats") -> tuple[DataFrame, Observation]:
    """Streaming-safe variant: attach an Observation computing the same
    metrics as a side effect of whatever sink runs — no extra pass over the
    data (SURVEY.md §4 item 2)."""
    obs = Observation(name)
    return df.observe(obs, *_report_metric_columns()), obs


def build_run_report(
    stats: dict,
    start_time: str | None = None,
    end_time: str | None = None,
    watermark_delay: str = WATERMARK_DELAY,
) -> dict:
    """Assemble the run_report document (shape: ingest_transform.py:44-52,
    318-324; spec tests/test_spark_jobs.py:331-357)."""
    now = datetime.now(timezone.utc).isoformat()
    total = int(stats.get("total_records", 0))
    report = {
        "total_records": total,
        "late_records": int(stats.get("late_records", 0)),
        "schema_drift_detected": int(stats.get("schema_drift_count", 0)) > 0,
        "dq_failures": int(stats.get("dq_failures", 0)),
        "schema_drift_count": int(stats.get("schema_drift_count", 0)),
        "processing_errors": int(stats.get("processing_errors", 0)),
        "start_time": start_time or now,
        "end_time": end_time or now,
        "watermark_delay": watermark_delay,
    }
    report["late_rate"] = report["late_records"] / total if total else 0.0
    report["dq_failure_rate"] = report["dq_failures"] / total if total else 0.0
    return report


def run_report_from_df(df: DataFrame, **kwargs) -> dict:
    row = run_report_agg(df).collect()[0]
    return build_run_report(row.asDict(), **kwargs)


def write_run_report(report: dict, path: str) -> None:
    """Persist the report JSON (reference S6 writes /data/ops/run_report.json)."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(report, indent=2))


def classify_dq_severity(failure_rate: float) -> str:
    """DQ failure-rate -> severity (reference D12, ops/notifications.py:
    295-304): >10% critical, >5% error, >1% warning, else info."""
    if failure_rate > 0.10:
        return "critical"
    if failure_rate > 0.05:
        return "error"
    if failure_rate > 0.01:
        return "warning"
    return "info"


def severity_expr(failure_rate: Column | str) -> Column:
    """The same classifier as a CASE expression, for set-based ops analytics."""
    c = F.col(failure_rate) if isinstance(failure_rate, str) else failure_rate
    return (
        F.when(c > 0.10, "critical")
        .when(c > 0.05, "error")
        .when(c > 0.01, "warning")
        .otherwise("info")
    )
