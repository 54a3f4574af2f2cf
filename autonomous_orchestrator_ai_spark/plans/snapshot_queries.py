"""Incremental-pipeline queries: snapshot change-data-capture and SCD
type-2 history building (operators/snapshot.py). The reference overwrites
on every run and never answers "what changed"; these make the delta a
first-class relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.snapshot import (
    scd2_intervals,
    snapshot_diff,
)
from autonomous_orchestrator_ai_spark.plans.registry import register, table


@register(
    "customer_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 7 <> 0),
    new AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 11 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS c_acctbal
      FROM customer WHERE c_custkey % 5 <> 0),
    diff AS (
      SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
             CASE WHEN o.c_custkey IS NULL THEN 'added'
                  WHEN n.c_custkey IS NULL THEN 'removed'
                  WHEN o.c_acctbal <> n.c_acctbal THEN 'changed'
             END AS change
      FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey)
    SELECT c_custkey, change FROM diff WHERE change IS NOT NULL
    """,
)
def customer_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two synthesized customer snapshots
    (operators.snapshot.snapshot_diff): old drops every 7th key, new drops
    every 5th and bumps every 11th's balance — the diff labels each key
    added/removed/changed from one digest-only full-outer join (the
    shuffle carries keys + 16-byte digests, never the payload)."""
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    old = cust.filter(F.col("c_custkey") % 7 != 0)
    new = cust.filter(F.col("c_custkey") % 5 != 0).withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 11 == 0, F.col("c_acctbal") + 100
        ).otherwise(F.col("c_acctbal")),
    )
    return snapshot_diff(old, new, ["c_custkey"], ["c_acctbal"])


@register(
    "user_event_type_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
      FROM events),
    changes AS (
      SELECT user_id, ts, event_id, event_type FROM ordered
      WHERE prev_t IS NULL OR event_type <> prev_t),
    iv AS (
      SELECT user_id, event_type, ts AS vf,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
      FROM changes)
    SELECT user_id, event_type,
           strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(strftime(vt, '%Y-%m-%d %H:%M:%S'), 'current') AS valid_to,
           vt IS NULL AS is_current
    FROM iv
    """,
)
def user_event_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 built from the event log
    (operators.snapshot.scd2_intervals): each user's event-type runs
    collapsed into validity intervals with a NULL-open current row. Two
    window passes over ONE (user_id, ts) sort — no self-join; event_id
    breaks equal-timestamp ties so the collapse is deterministic."""
    events = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    iv = scd2_intervals(
        events, ["user_id"], "ts", ["event_type"], tie_cols=["event_id"]
    )
    return iv.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss"), F.lit("current")
        ).alias("valid_to"),
        "is_current",
    )
