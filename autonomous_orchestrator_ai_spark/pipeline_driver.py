"""End-to-end pipeline tick — the in-process equivalent of the reference's
Airflow DAG (pipeline_dag.py:464, SURVEY.md §3.1):

    monitor -> run ingest -> data quality -> decide -> validate -> cleanup

No subprocess hops: stages pass metrics as dicts (the reference's JSON file
contracts are still written for observability). Any stage failure becomes an
incident + notification (the reference's failure callback C7).
"""

from __future__ import annotations

import json
from datetime import datetime
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.agent.decision import (
    DecisionContext,
    log_decision,
    rule_based_decision,
)
from autonomous_orchestrator_ai_spark.agent.tools import PipelineTools
from autonomous_orchestrator_ai_spark.operators.dq import dimension_scores, run_suite
from autonomous_orchestrator_ai_spark.operators.dq_suites import customers_suite
from autonomous_orchestrator_ai_spark.operators.incidents import IncidentStore
from autonomous_orchestrator_ai_spark.operators.report import build_run_report
from autonomous_orchestrator_ai_spark.operators.transform import parse_kafka_messages
from autonomous_orchestrator_ai_spark.schemas import customer_events_schema
from autonomous_orchestrator_ai_spark.sources.readers import jsonl_as_kafka_envelope
from autonomous_orchestrator_ai_spark.sources.writers import cleanup_old_data
from autonomous_orchestrator_ai_spark.streaming.pipeline import (
    run_bounded,
    streaming_enrich,
    with_quality_score,
    with_run_observation,
)


def run_pipeline_once(
    spark: SparkSession,
    input_dir: str,
    work_dir: str,
    now: datetime | None = None,
    retention_days: int = 7,
    quality_weights: dict[int, float] | None = None,
    quality_text_col: str = "name",
) -> dict:
    """One pipeline tick over a JSONL event directory (the broker-less stand
    -in for the Kafka topic). Returns the decision + all stage outputs.

    Layout under ``work_dir``: curated/ (partitioned parquet sink),
    checkpoints/, ops/ (run_report.json, ge_results.json, decisions.jsonl,
    notifications.jsonl), incidents/.
    """
    now = now or datetime.now()
    work = Path(work_dir)
    ops = work / "ops"
    ops.mkdir(parents=True, exist_ok=True)
    incidents = IncidentStore(spark, str(work / "incidents"))
    tools = PipelineTools(str(ops), incident_store=incidents)
    now_lit = F.to_timestamp(F.lit(now.strftime("%Y-%m-%d %H:%M:%S")))

    try:
        # ---- C2: bounded ingest run (stream -> curated parquet) ----------
        envelope = jsonl_as_kafka_envelope(spark, input_dir, streaming=True)
        # parse against the widest declared schema so drifted payload fields
        # survive into the curated store (drift flag still marks them)
        parsed = parse_kafka_messages(envelope, customer_events_schema(3))
        enriched = streaming_enrich(parsed, processing_time=now_lit)
        observed = with_run_observation(enriched)
        if quality_weights is not None:
            # r7: curation scoring in the SAME bounded tick the DQ flags
            # ride — stateless map stage, model constant embedded in-plan
            observed = with_quality_score(
                observed, quality_weights, text_col=quality_text_col
            )
        totals = run_bounded(
            observed,
            str(work / "curated"),
            str(work / "checkpoints" / "curated"),
            partition_by=["country", "plan"],
            timeout_seconds=300,
        )
        run_report = build_run_report(totals, start_time=now.isoformat())
        if "quality_scored_records" in totals:
            run_report["quality_scored_records"] = totals["quality_scored_records"]
            run_report["quality_mean_score"] = round(
                totals["quality_mean_score"], 6
            )
        (ops / "run_report.json").write_text(json.dumps(run_report, indent=2))

        # ---- C3: declarative DQ over the curated table -------------------
        curated = spark.read.parquet(str(work / "curated"))
        ge_results = run_suite(
            curated, customers_suite(freshness_window=True), now=now, collect_examples=10
        )
        ge_results["dimensions"] = dimension_scores(ge_results)
        (ops / "ge_results.json").write_text(json.dumps(ge_results, indent=2, default=str))

        # ---- C4: decide + execute remediation ----------------------------
        context = DecisionContext(
            run_report=run_report,
            ge_results=ge_results,
            recent_incidents=[r.asDict() for r in incidents.recent(days=7, now=now).collect()],
        )
        decision = rule_based_decision(context)
        executed = tools.execute_actions(decision.actions)
        log_decision(decision, context, ops / "decisions.jsonl", now=now)
        if decision.escalation_required:
            incidents.log_incident(
                "pipeline_escalation",
                decision.reasoning,
                context={"run_report": run_report},
                severity="high",
                now=now,
            )

        # ---- C5: validate load ------------------------------------------
        loaded = spark.read.parquet(str(work / "curated")).count()
        validation = {"rows_in_curated": loaded, "ok": loaded > 0}
        (ops / "load_validation.json").write_text(json.dumps(validation))

        # ---- C6: retention ----------------------------------------------
        removed = cleanup_old_data(str(work / "checkpoints"), retention_days)

        return {
            "run_report": run_report,
            "ge_results_summary": ge_results["summary"],
            "decision": decision.to_dict(),
            "actions_executed": executed,
            "validation": validation,
            "retention_removed": removed,
        }
    except Exception as exc:  # C7: failure callback -> incident + notify
        incidents.log_incident(
            "pipeline_failure", f"pipeline tick failed: {exc}", severity="high", now=now
        )
        tools.notify_ops(f"Pipeline tick failed: {exc}", severity="critical")
        raise
