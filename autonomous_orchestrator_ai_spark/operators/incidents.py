"""Incidents store + ops analytics (reference S8/A2-A5/O1-O2/D10/D13).

The reference keeps incidents in SQLite with in-place UPDATEs
(ops/incident_store.py:41-74, 125-154, 261-290) plus a JSONL fallback. A
Spark-native store can't update Parquet in place, so the design follows
SURVEY.md §7.4: an **append-only JSONL/parquet event log is the source of
truth**, and the "current state" is a view —
``row_number() over (partition by id order by updated_at desc) = 1`` — which
also supplies the window-function coverage the reference lacks (§2.5).

At scale: the log partitions by date; the latest-state window shuffles by
incident id only over the retention window read; stats queries aggregate the
deduped view.
"""

from __future__ import annotations

import json
import uuid
from datetime import datetime, timedelta
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.schemas import INCIDENTS_SCHEMA


class IncidentStore:
    """Append-only incident log with a latest-state view.

    ``base_path`` holds ``log.jsonl`` (append-only; the source of truth,
    mirroring the reference's JSONL fallback incident_store.py:156-162).

    Concurrency contract: SINGLE WRITER (the decision agent / pipeline
    driver), matching the reference's deployment shape. Appends use
    O_APPEND one-line writes — safe against a concurrent READER on a
    local filesystem — but two concurrent writers can (a) interleave
    ``update_incident``'s read-modify-append so the later appender
    silently discards the other's field updates (lost update), and
    (b) produce identical ``updated_at`` timestamps, making
    ``latest_state``'s last-version-wins ordering nondeterministic
    between their rows. Multi-writer deployments must serialize through
    one agent process or an external lock; this store intentionally does
    not take file locks (the reference's SQLite path gets this from the
    database instead)."""

    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base = Path(base_path)
        self.base.mkdir(parents=True, exist_ok=True)
        self.log_path = self.base / "log.jsonl"

    # -- writes (driver-side appends; incidents are ops metadata, not data
    # -- plane — single-row writes don't warrant a Spark job)

    def log_incident(
        self,
        incident_type: str,
        summary: str,
        context: dict | None = None,
        severity: str = "medium",
        created_by: str = "pipeline_agent",
        now: datetime | None = None,
    ) -> str:
        """Insert (reference incident_store.py:125-154). Auto-escalates on
        severity high/critical (reference D10, tools.py:223-267)."""
        now = now or datetime.now()
        incident_id = str(uuid.uuid4())
        escalated = severity in ("high", "critical")
        rec = {
            "id": incident_id,
            "incident_type": incident_type,
            "summary": summary,
            "context": json.dumps(context or {}),
            "severity": severity,
            "status": "open",
            "created_at": now.isoformat(),
            "updated_at": now.isoformat(),
            "resolved_at": None,
            "escalated_at": now.isoformat() if escalated else None,
            "escalated": escalated,
            "resolution_notes": None,
            "created_by": created_by,
        }
        with self.log_path.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        return incident_id

    def update_incident(self, incident_id: str, now: datetime | None = None, **updates) -> None:
        """Update = append a new version row (dynamic-SET equivalent of
        incident_store.py:261-290)."""
        current = self.latest_state().filter(F.col("id") == incident_id).collect()
        if not current:
            raise KeyError(f"incident {incident_id} not found")
        rec = current[0].asDict()
        for k in ("created_at", "updated_at", "resolved_at", "escalated_at"):
            if rec.get(k) is not None:
                rec[k] = rec[k].isoformat()
        rec.update(updates)
        rec["updated_at"] = (now or datetime.now()).isoformat()
        with self.log_path.open("a") as f:
            f.write(json.dumps(rec) + "\n")

    def resolve_incident(
        self, incident_id: str, notes: str | None = None, now: datetime | None = None
    ) -> None:
        now = now or datetime.now()
        self.update_incident(
            incident_id,
            now=now,
            status="resolved",
            resolved_at=now.isoformat(),
            resolution_notes=notes,
        )

    # -- reads (Spark SQL over the log)

    def log_df(self) -> DataFrame:
        if not self.log_path.exists() or self.log_path.stat().st_size == 0:
            return self.spark.createDataFrame([], INCIDENTS_SCHEMA)
        df = self.spark.read.json(str(self.log_path))
        cols = []
        for f_ in INCIDENTS_SCHEMA.fields:
            c = F.col(f_.name) if f_.name in df.columns else F.lit(None)
            cols.append(c.cast(f_.dataType).alias(f_.name))
        return df.select(*cols)

    def latest_state(self) -> DataFrame:
        """Current state per incident: last appended version wins
        (row_number over id ordered by updated_at desc)."""
        w = Window.partitionBy("id").orderBy(F.desc("updated_at"))
        return (
            self.log_df()
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def recent(
        self,
        days: int = 7,
        incident_type: str | None = None,
        now: datetime | None = None,
    ) -> DataFrame:
        """Recent incidents, newest first (reference incident_store.py:
        200-234: WHERE created_at >= cutoff [AND type] ORDER BY created_at
        DESC)."""
        cutoff = (now or datetime.now()) - timedelta(days=days)
        df = self.latest_state().filter(F.col("created_at") >= F.lit(cutoff))
        if incident_type:
            df = df.filter(F.col("incident_type") == incident_type)
        return df.orderBy(F.desc("created_at"))

    def stats(self, days: int = 7, now: datetime | None = None) -> dict:
        """Grouped stats (reference A2-A5, incident_store.py:316-371):
        counts by type / severity / status + total + escalated — computed in
        ONE pass via grouping sets instead of four separate queries."""
        cutoff = (now or datetime.now()) - timedelta(days=days)
        df = self.latest_state().filter(F.col("created_at") >= F.lit(cutoff))
        rows = (
            df.cube("incident_type", "severity", "status")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("escalated").cast("int")).alias("n_escalated"),
            )
            .collect()
        )
        by_type: dict[str, int] = {}
        by_severity: dict[str, int] = {}
        by_status: dict[str, int] = {}
        total = escalated = 0
        for r in rows:
            t, s, st = r["incident_type"], r["severity"], r["status"]
            if t is None and s is None and st is None:
                total, escalated = r["n"], int(r["n_escalated"] or 0)
            elif t is not None and s is None and st is None:
                by_type[t] = r["n"]
            elif t is None and s is not None and st is None:
                by_severity[s] = r["n"]
            elif t is None and s is None and st is not None:
                by_status[st] = r["n"]
        return {
            "total_incidents": total,
            "escalated_count": escalated,
            "by_type": by_type,
            "by_severity": by_severity,
            "by_status": by_status,
            "window_days": days,
        }
