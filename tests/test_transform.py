"""Transform-pipeline operator tests (reference spec:
tests/test_spark_jobs.py — here against the real engine code, not pandas
simulations)."""

from __future__ import annotations

from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.functions.enrich import (
    COUNTRY_REGION_MAP,
    email_domain,
    region_expr,
)
from autonomous_orchestrator_ai_spark.operators.transform import (
    apply_schema_remap,
    detect_late_arrivals,
    enrich_customer_events,
    quarantine_split,
)
from autonomous_orchestrator_ai_spark.schemas import customer_events_schema

#: deterministic "processing time" for the fixture
NOW = "2024-01-15 01:00:00"


def _enriched(events_fixture):
    return enrich_customer_events(
        events_fixture, processing_time=F.to_timestamp(F.lit(NOW))
    )


def test_region_mapping(spark):
    """Reference pairs incl. Other default (tests/test_spark_jobs.py:115-141)."""
    rows = [(c,) for c in COUNTRY_REGION_MAP] + [("XX",), (None,)]
    df = spark.createDataFrame(rows, ["country"])
    got = {r["country"]: r["region"] for r in df.select("country", region_expr().alias("region")).collect()}
    for c, expected in COUNTRY_REGION_MAP.items():
        assert got[c] == expected
    assert got["XX"] == "Other"
    assert got[None] == "Other"


def test_email_domain(spark):
    df = spark.createDataFrame(
        [("a@example.com",), ("x@sub.domain.org",), ("no-at-sign",)], ["email"]
    )
    got = [r[0] for r in df.select(email_domain("email")).collect()]
    assert got == ["example.com", "sub.domain.org", ""]


def test_dq_flags_truth_table(events_fixture):
    """One violation per rule (reference test_dq.py fixture semantics)."""
    out = {r["id"]: r for r in _enriched(events_fixture).collect()}
    assert out["cust_001"]["dq_passed"] is True
    assert out["cust_002"]["dq_passed"] is True
    # invalid email + plan
    assert out["cust_003"]["dq_email_valid"] is False
    assert out["cust_003"]["dq_plan_valid"] is False
    assert out["cust_003"]["dq_passed"] is False
    # future signup does NOT fail inline DQ (it's a suite-level rule);
    # event in the past is fine
    assert out["cust_004"]["dq_timestamp_valid"] is True
    # event before signup is still a valid timestamp per inline rules
    assert out["cust_005"]["dq_timestamp_valid"] is True
    assert out["cust_001"]["region"] == "North America"
    assert out["cust_004"]["region"] == "Europe"
    assert out["cust_001"]["email_domain"] == "example.com"


def test_late_arrival_threshold(spark):
    """15-min threshold cases (reference tests/test_spark_jobs.py:159-178)."""
    df = spark.createDataFrame(
        [("a", "2024-01-15 00:46:00"), ("b", "2024-01-15 00:44:59"), ("c", "2024-01-15 01:00:00")],
        ["id", "event_str"],
    ).select(
        "id",
        F.to_timestamp("event_str").alias("event_timestamp"),
        F.to_timestamp(F.lit("2024-01-15 01:00:00")).alias("processing_timestamp"),
    )
    out = {r["id"]: r["is_late_arrival"] for r in detect_late_arrivals(df).collect()}
    assert out == {"a": False, "b": True, "c": False}  # >15min late only


def test_drift_flag(events_fixture):
    df = events_fixture.withColumn(
        "version", F.when(F.col("id") == "cust_001", 2).otherwise(1)
    )
    out = {r["id"]: r["schema_drift_detected"] for r in enrich_customer_events(
        df, processing_time=F.to_timestamp(F.lit(NOW))
    ).collect()}
    assert out["cust_001"] is True
    assert out["cust_002"] is False


def test_quarantine_split(events_fixture):
    quarantined, clean = quarantine_split(events_fixture, "country = 'INVALID'")
    assert [r["id"] for r in quarantined.collect()] == ["cust_003"]
    assert sorted(r["id"] for r in clean.collect()) == [
        "cust_001", "cust_002", "cust_004", "cust_005",
    ]


def test_quarantine_split_null_safe(spark):
    df = spark.createDataFrame([("a", None), ("b", "x")], ["id", "c"])
    quarantined, clean = quarantine_split(df, "c = 'x'")
    assert [r["id"] for r in quarantined.collect()] == ["b"]
    # NULL-condition rows stay in clean (not silently dropped)
    assert [r["id"] for r in clean.collect()] == ["a"]


def test_schema_remap(spark):
    """D7: rename + fill-missing + cast + drop-extra (tools.py:91-134)."""
    df = spark.createDataFrame(
        [("1", "a@b.co", "2024", "junk")], ["customer_id", "mail", "signup_ts", "extra"]
    )
    target = customer_events_schema(1)
    out = apply_schema_remap(
        df, {"customer_id": "id", "mail": "email"}, target
    )
    assert out.columns == [f.name for f in target.fields]
    row = out.collect()[0]
    assert row["id"] == "1" and row["email"] == "a@b.co"
    assert row["name"] is None and row["country"] is None
    assert dict(out.dtypes)["signup_ts"] == "bigint"
