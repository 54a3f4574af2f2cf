"""End-to-end pipeline tick at sf1: the reference's WHOLE DAG semantics
(event source -> parse -> enrich -> DQ flags -> quarantine-aware curated
sink -> run report -> GE suite -> decision -> incidents -> retention) as
ONE measured bounded run over 1,000,000 events (10x the sf0.1 events
table — the sf1 grain), with a seeded late/drift/missing scenario that
must trip the reference's rule thresholds.

Writes PIPELINE_TICK_sf1.json at the repo root:
  - rows/sec for the streaming ingest leg and for the whole tick,
  - the per-stage observe() metrics (run_report: late/drift/dq-flag
    counts the sink observed batch by batch),
  - the decision actions + escalation flag and the thresholds they
    tripped, cross-checked against the seeded rates.

Usage: python tools/pipeline_tick_sf1.py [n_events] [work_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

sys.path.insert(0, ".")

N_DEFAULT = 1_000_000
SHARDS = 8
NOW = datetime(2024, 1, 15, 1, 0, 0, tzinfo=timezone.utc)

#: seeded anomaly scenario: late 20% (> 0.15 escalation threshold),
#: drift every 10th event, 10% missing country/plan (drives DQ flag rate)
SCENARIO = {"late_rate": 0.2, "missing_rate": 0.1, "drift_frequency": 10}


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT
    work_root = Path(sys.argv[2] if len(sys.argv) > 2 else ".scale/tick_sf1")

    from autonomous_orchestrator_ai_spark.pipeline_driver import (
        run_pipeline_once,
    )
    from autonomous_orchestrator_ai_spark.session import get_spark
    from autonomous_orchestrator_ai_spark.testing.generator import (
        EventGenerator,
    )

    if work_root.exists():
        shutil.rmtree(work_root)
    indir = work_root / "in"

    t0 = time.time()
    gen = EventGenerator(seed=11, n_customers=5000, now=NOW, **SCENARIO)
    # last shard takes the remainder so the requested event count is
    # honored exactly even when n_events % SHARDS != 0 (ADVICE r6)
    per_shard = n_events // SHARDS
    sizes = [per_shard] * (SHARDS - 1) + [per_shard + n_events % SHARDS]
    for s, size in enumerate(sizes):
        gen.write_jsonl(indir / f"batch_{s:02d}.jsonl", size)
    gen_sec = time.time() - t0

    spark = get_spark("pipeline-tick-sf1")
    # r7: curation scoring rides the same bounded tick as the DQ flags —
    # the weight table is a bounded deterministic model constant (the
    # frozen md5 table; a train_logistic_gd table is the same shape)
    from autonomous_orchestrator_ai_spark.operators.classify import (
        TRAIN_BUCKETS,
        frozen_weight_table,
        weight_table_as_dict,
    )

    qweights = weight_table_as_dict(frozen_weight_table(spark, TRAIN_BUCKETS))
    t0 = time.time()
    result = run_pipeline_once(
        spark, str(indir), str(work_root / "work"),
        now=NOW.replace(tzinfo=None), quality_weights=qweights,
    )
    tick_sec = time.time() - t0

    rr = result["run_report"]
    decision = result["decision"]
    decisions_jsonl = (
        (work_root / "work" / "ops" / "decisions.jsonl").read_text().strip()
    )

    # threshold cross-check: the seeded scenario must trip the rules
    checks = {
        "late_rate_observed": rr["late_rate"],
        "late_rate_tripped_threshold": rr["late_rate"] > 0.15,
        "drift_count_observed": rr["schema_drift_count"],
        "drift_expected": n_events // SCENARIO["drift_frequency"],
        "escalation_required": decision["escalation_required"],
        "tools_invoked": [a["tool"] for a in decision["actions_taken"]],
        "all_actions_succeeded": all(
            a["result"]["success"] for a in result["actions_executed"]
        ),
    }
    checks["quality_scored_records"] = rr.get("quality_scored_records")
    checks["quality_mean_score"] = rr.get("quality_mean_score")
    ok = (
        rr["total_records"] == n_events
        and rr.get("quality_scored_records") == n_events
        and checks["late_rate_tripped_threshold"]
        and checks["escalation_required"]
        and checks["drift_count_observed"] == checks["drift_expected"]
        and "apply_schema_remap" in checks["tools_invoked"]
        and checks["all_actions_succeeded"]
        and result["validation"]["ok"]
    )

    artifact = {
        "n_events": n_events,
        "scenario": SCENARIO,
        "generate_sec": round(gen_sec, 1),
        "tick_sec": round(tick_sec, 1),
        "tick_rows_per_sec": round(n_events / tick_sec, 1),
        "stage_metrics_run_report": rr,
        "ge_summary": result["ge_results_summary"],
        "decision": decision,
        "decisions_jsonl_tail": decisions_jsonl.splitlines()[-1],
        "validation": result["validation"],
        "threshold_checks": checks,
        "ok": ok,
    }
    tag = "sf1" if n_events == N_DEFAULT else f"{n_events}ev"
    Path(f"PIPELINE_TICK_{tag}.json").write_text(json.dumps(artifact, indent=1))
    print(json.dumps({k: artifact[k] for k in (
        "n_events", "tick_sec", "tick_rows_per_sec", "ok")}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
