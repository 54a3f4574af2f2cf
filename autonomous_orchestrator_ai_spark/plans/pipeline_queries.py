"""Pipeline-semantics queries over the synthetic ``events`` table.

These re-express the reference's streaming-ETL operator surface (SURVEY.md
§2.2/§2.4/§2.8) as oracle-checkable batch queries on the driver's star
schema. The ``events`` table stands in for the customer-event stream
(FIXTURES.md §6); a synthetic per-row processing delay (``value * 4``
seconds) replaces wall-clock processing time so late-arrival semantics
(reference P9, ingest_transform.py:211-225) stay deterministic.

Scale notes: every query is a scan + single hash-aggregate; conditional
counts ride the same aggregate (map-side partial agg ⇒ bytes shuffled are
O(groups), not O(rows)). No UDFs anywhere — all whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.transform import quarantine_split
from autonomous_orchestrator_ai_spark.plans.registry import (
    exact_money_sum,
    register,
    table,
)

#: Synthetic processing delay in seconds := value * 4 (deterministic stand-in
#: for processing_timestamp - event_timestamp; late iff > 900s, i.e. the
#: reference's 15-minute watermark threshold). Lazy: Column construction
#: needs an active session.
def late_seconds() -> F.Column:
    return F.col("value") * 4


LATE_SQL = "(value * 4) > 900"

#: Valid event types (events table domain) — analog of the plan enum check P7.
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
_TYPES_SQL = "('signup','click','error','view','purchase')"

#: props payload validity (analog of the email regex check P4).
PROPS_REGEX = r'^\{"k": \d+\}$'

#: drift analog of version>1 (P3): payload k >= 90.
DRIFT_SQL = "COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) >= 90, FALSE)"


def _drift_col() -> F.Column:
    return F.coalesce(
        F.get_json_object("props", "$.k").try_cast("int") >= 90, F.lit(False)
    )


def _dq_cols(df: DataFrame) -> DataFrame:
    """Inline DQ flags over events — same shapes as reference P4-P8."""
    return (
        df.withColumn("dq_props_valid", F.col("props").rlike(PROPS_REGEX))
        .withColumn("dq_user_not_null", F.col("user_id").isNotNull())
        .withColumn("dq_value_valid", F.col("value").between(0, 450))
        .withColumn("dq_type_valid", F.col("event_type").isin(EVENT_TYPES))
        .withColumn(
            "dq_passed",
            F.col("dq_props_valid")
            & F.col("dq_user_not_null")
            & F.col("dq_value_valid")
            & F.col("dq_type_valid"),
        )
    )


# NOTE: DuckDB single-quoted literals pass backslashes through verbatim, so
# the Python regex string is embedded as-is.
_DQ_PASSED_SQL = (
    f"(regexp_matches(props, '{PROPS_REGEX}') "
    "AND user_id IS NOT NULL AND value BETWEEN 0 AND 450 "
    f"AND event_type IN {_TYPES_SQL})"
)


@register(
    "pipeline_run_report",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS total_records,
           CAST(COUNT(CASE WHEN {LATE_SQL} THEN 1 END) AS BIGINT) AS late_records,
           CAST(COUNT(CASE WHEN NOT {_DQ_PASSED_SQL} THEN 1 END) AS BIGINT) AS dq_failures,
           CAST(COUNT(CASE WHEN {DRIFT_SQL} THEN 1 END) AS BIGINT) AS schema_drift_count
    FROM events
    """,
)
def pipeline_run_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference A1 (ingest_transform.py:310-316): the global
    conditional-count run-report aggregate — one row, four counters."""
    ev = _dq_cols(table(spark, sf_dir, "events"))
    return ev.agg(
        F.count(F.lit(1)).alias("total_records"),
        F.count(F.when(late_seconds() > 900, 1)).alias("late_records"),
        F.count(F.when(~F.col("dq_passed"), 1)).alias("dq_failures"),
        F.count(F.when(_drift_col(), 1)).alias("schema_drift_count"),
    )


@register(
    "dq_flag_rates",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS total_records,
           ROUND(SUM(CASE WHEN regexp_matches(props, '{PROPS_REGEX}') THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS props_valid_rate,
           ROUND(SUM(CASE WHEN user_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS user_not_null_rate,
           ROUND(SUM(CASE WHEN value BETWEEN 0 AND 450 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS value_valid_rate,
           ROUND(SUM(CASE WHEN event_type IN {_TYPES_SQL} THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS type_valid_rate,
           ROUND(SUM(CASE WHEN {_DQ_PASSED_SQL} THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS dq_pass_rate
    FROM events
    """,
)
def dq_flag_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference A6 (tests/test_dq.py:135-185): per-dimension DQ success
    rates — sum of boolean indicators over count, one aggregate pass."""
    ev = _dq_cols(table(spark, sf_dir, "events"))

    def rate(c: str) -> F.Column:
        return F.round(
            F.sum(F.col(c).cast("int")) / F.count(F.lit(1)), 6
        )

    return ev.agg(
        F.count(F.lit(1)).alias("total_records"),
        rate("dq_props_valid").alias("props_valid_rate"),
        rate("dq_user_not_null").alias("user_not_null_rate"),
        rate("dq_value_valid").alias("value_valid_rate"),
        rate("dq_type_valid").alias("type_valid_rate"),
        rate("dq_passed").alias("dq_pass_rate"),
    )


@register(
    "events_by_type",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value,
           ROUND(AVG(value), 4) AS avg_value
    FROM events GROUP BY event_type
    """,
)
def events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference A2-A4 shape (incident_store.py:330-354): grouped counts,
    plus distinct-count and avg (SURVEY.md §2.4 'free from Catalyst')."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            exact_money_sum(F.col("value")).alias("total_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


@register(
    "event_category_decode",
    oracle="""
    SELECT CASE WHEN event_type = 'purchase' THEN 'revenue'
                WHEN event_type IN ('click','view') THEN 'engagement'
                WHEN event_type = 'signup' THEN 'growth'
                WHEN event_type = 'error' THEN 'ops'
                ELSE 'other' END AS category,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
)
def event_category_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference F3/P3 shape (ingest_transform.py:181-195): dictionary decode
    as a chained CASE — constant-folded, no join, no shuffle beyond the agg."""
    ev = table(spark, sf_dir, "events")
    category = (
        F.when(F.col("event_type") == "purchase", "revenue")
        .when(F.col("event_type").isin("click", "view"), "engagement")
        .when(F.col("event_type") == "signup", "growth")
        .when(F.col("event_type") == "error", "ops")
        .otherwise("other")
    )
    return ev.groupBy(category.alias("category")).agg(F.count(F.lit(1)).alias("n_events"))


@register(
    "late_arrivals_by_type",
    oracle=f"""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS late_events,
           ROUND(MAX(value * 4), 2) AS max_delay_seconds
    FROM events WHERE {LATE_SQL} GROUP BY event_type
    """,
)
def late_arrivals_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference P9/T2: late-arrival flagging, grouped. Filter is pushed to
    the parquet scan (value is a scan column)."""
    return (
        table(spark, sf_dir, "events")
        .filter(late_seconds() > 900)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("late_events"),
            F.round(F.max(F.col("value") * 4), 2).alias("max_delay_seconds"),
        )
    )


@register(
    "payload_key_profile",
    oracle="""
    SELECT array_to_string(json_keys(props), ',') AS key_set,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
)
def payload_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-level schema-drift detection (fixes the reference's inert
    column diff, SURVEY.md §3.2): profile actual payload key-sets via
    json_object_keys — expression-level, no second parse job."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.array_join(F.json_object_keys("props"), ",").alias("key_set")
    ).agg(F.count(F.lit(1)).alias("n_events"))


@register(
    "quarantine_split_counts",
    oracle="""
    SELECT 'quarantined' AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM events WHERE value > 400 OR user_id IS NULL
    UNION ALL
    SELECT 'clean' AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM events WHERE NOT COALESCE(value > 400 OR user_id IS NULL, FALSE)
    """,
)
def quarantine_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference P10/D8 (agent/tools.py:142-177): split on an agent-issued
    SQL condition string; both sides share one scan (Catalyst exchange
    reuse)."""
    ev = table(spark, sf_dir, "events")
    quarantined, clean = quarantine_split(ev, "value > 400 OR user_id IS NULL")

    def side(df: DataFrame, bucket: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            exact_money_sum(F.col("value")).alias("total_value"),
        ).select(F.lit(bucket).alias("bucket"), "n_rows", "total_value")

    return side(quarantined, "quarantined").unionAll(side(clean, "clean"))


@register(
    "customer_name_parse",
    oracle="""
    SELECT TRY_CAST(regexp_extract(c_name, '#(\\d+)', 1) AS BIGINT) % 10 AS name_digit,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(c_acctbal), 4) AS avg_acctbal
    FROM customer GROUP BY 1
    """,
)
def customer_name_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference F4 shape (regexp_extract enrichment, ingest_transform.py:
    197-201) applied to customer names."""
    cust = table(spark, sf_dir, "customer")
    digit = (F.regexp_extract("c_name", r"#(\d+)", 1).try_cast("bigint") % 10).alias(
        "name_digit"
    )
    return cust.groupBy(digit).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
    )
