"""Sinks (reference S4/S5/S8 quarantine + partitioned parquet, SURVEY.md §2.1).

Partitioning choice mirrors the reference (country, plan —
ingest_transform.py:267) which enables partition pruning on read. At 100 TB,
(country, plan) yields ~40 partitions/day of manageable size; adding a date
partition column keeps file counts bounded and retention cheap (drop whole
date partitions instead of the reference's os.walk sweep, S10).
"""

from __future__ import annotations

import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] = ("country", "plan"),
    mode: str = "append",
) -> None:
    """Batch partitioned parquet writer (reference S4's batch twin)."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def stream_to_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] = ("country", "plan"),
    trigger: dict | None = None,
):
    """Streaming partitioned parquet sink (reference S4, ingest_transform.py:
    255-271): append mode, checkpointed, 30s processing-time trigger by
    default; pass ``trigger={"availableNow": True}`` for bounded test runs."""
    trigger = trigger or {"processingTime": "30 seconds"}
    return (
        df.writeStream.format("parquet")
        .outputMode("append")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(*partition_by)
        .trigger(**trigger)
        .start()
    )


def foreach_batch_jdbc_sink(url: str, table: str, options: dict | None = None):
    """foreachBatch relational sink (reference S5's Snowflake writer,
    ingest_transform.py:273-305), generalized to any JDBC target.

    Skips empty batches with ``isEmpty()`` — the reference used
    ``count() > 0`` which forces a full extra job per micro-batch
    (SURVEY.md §4 note)."""

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        writer = batch_df.write.format("jdbc").option("url", url).option("dbtable", table)
        for k, v in (options or {}).items():
            writer = writer.option(k, v)
        writer.mode("append").save()

    return _write


def write_quarantine(
    quarantined: DataFrame, base_path: str, metadata: dict, timestamp: str | None = None
) -> str:
    """Write quarantined rows + metadata JSON to a timestamped dir (reference
    D8, agent/tools.py:136-177 — the reference only wrote the metadata; the
    record movement it deferred happens here)."""
    import json

    ts = timestamp or time.strftime("%Y%m%d_%H%M%S")
    qdir = Path(base_path) / f"quarantine_{ts}"
    quarantined.write.mode("overwrite").parquet(str(qdir / "records"))
    qdir.mkdir(parents=True, exist_ok=True)
    (qdir / "metadata.json").write_text(json.dumps(metadata, indent=2))
    return str(qdir)


def cleanup_old_data(base_path: str, retention_days: int = 7) -> list[str]:
    """Retention sweep (reference S10/C6, pipeline_dag.py:392-423): remove
    top-level entries older than the retention window. For partitioned
    tables prefer dropping date partitions."""
    cutoff = time.time() - retention_days * 86400
    removed: list[str] = []
    base = Path(base_path)
    if not base.exists():
        return removed
    for entry in base.iterdir():
        if entry.stat().st_ctime < cutoff:
            shutil.rmtree(entry) if entry.is_dir() else entry.unlink()
            removed.append(str(entry))
    return removed
