"""Integration test: the full self-healing tick (§3.1 chain) in-process."""

from __future__ import annotations

import json
from datetime import datetime, timezone
from pathlib import Path

from autonomous_orchestrator_ai_spark.pipeline_driver import run_pipeline_once
from autonomous_orchestrator_ai_spark.testing.generator import EventGenerator

NOW = datetime(2024, 1, 15, 1, 0, 0, tzinfo=timezone.utc)


def test_full_pipeline_tick(spark, tmp_path):
    g = EventGenerator(
        seed=11, n_customers=40, now=NOW, late_rate=0.3, drift_frequency=10
    )  # late_rate 0.3 > 0.15 threshold -> escalation expected
    indir = tmp_path / "in"
    g.write_jsonl(indir / "batch.jsonl", 200)

    result = run_pipeline_once(
        spark, str(indir), str(tmp_path / "work"), now=NOW.replace(tzinfo=None)
    )

    rr = result["run_report"]
    assert rr["total_records"] == 200
    assert rr["late_rate"] > 0.15
    assert rr["schema_drift_count"] == 20

    # decision: escalate on late rate, remap on drift, notify always
    d = result["decision"]
    assert d["escalation_required"] is True
    tools_used = [a["tool"] for a in d["actions_taken"]]
    assert "apply_schema_remap" in tools_used and "notify_ops" in tools_used
    assert all(a["result"]["success"] for a in result["actions_executed"])

    ops = tmp_path / "work" / "ops"
    assert json.loads((ops / "run_report.json").read_text())["total_records"] == 200
    ge = json.loads((ops / "ge_results.json").read_text())
    assert ge["summary"]["total_expectations"] == 15
    remap = json.loads((ops / "schema_remap.json").read_text())
    assert remap["applied"] is False and remap["version"] == 1
    assert (ops / "decisions.jsonl").exists()
    assert result["validation"]["ok"]

    # escalation recorded as a high-severity incident
    inc_dir = tmp_path / "work" / "incidents"
    incidents = [
        json.loads(l)
        for p in sorted(inc_dir.glob("log*.jsonl"))
        for l in p.read_text().splitlines()
    ]
    assert any(i["incident_type"] == "pipeline_escalation" and i["escalated"] for i in incidents)

    # curated store partitioned by (country, plan)
    curated = tmp_path / "work" / "curated"
    assert any(p.name.startswith("country=") for p in Path(curated).iterdir() if p.is_dir())


def test_healthy_pipeline_no_escalation(spark, tmp_path):
    g = EventGenerator(seed=12, n_customers=40, now=NOW, late_rate=0.0, drift_frequency=0)
    indir = tmp_path / "in"
    g.write_jsonl(indir / "batch.jsonl", 100)
    result = run_pipeline_once(
        spark, str(indir), str(tmp_path / "work"), now=NOW.replace(tzinfo=None)
    )
    d = result["decision"]
    assert d["escalation_required"] is False
    assert "running normally" in d["reasoning"]
    assert [a["tool"] for a in d["actions_taken"]] == ["notify_ops"]
