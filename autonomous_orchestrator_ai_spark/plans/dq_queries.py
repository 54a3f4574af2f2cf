"""Declarative-DQ queries: the expectation engine run as an oracle-checked
DataFrame query over the star schema (engine: operators/dq.py; reference
surface SURVEY.md §2.10)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.dq import Expectation, suite_violation_counts
from autonomous_orchestrator_ai_spark.plans.registry import register, table

#: A suite over ``orders`` exercising Q2/Q3/Q5/Q7/Q4/Q8-style expectations
#: on real data.
ORDERS_SUITE = [
    Expectation("expect_column_to_exist", {"column": "o_orderkey"}),
    Expectation("expect_column_values_to_not_be_null", {"column": "o_orderkey"}),
    Expectation("expect_column_values_to_be_unique", {"column": "o_orderkey"}),
    Expectation(
        "expect_column_values_to_be_in_set",
        {"column": "o_orderstatus", "value_set": ["O", "F", "P"]},
    ),
    Expectation(
        "expect_column_values_to_match_regex",
        {"column": "o_orderpriority", "regex": r"^[1-5]-[A-Z ]+$"},
    ),
    Expectation(
        "expect_column_values_to_be_between",
        {"column": "o_totalprice", "min_value": 0, "max_value": 100000},
    ),
    Expectation(
        "expect_column_values_to_be_between",
        {
            "column": "o_orderdate",
            "min_value": datetime(1995, 1, 1),
            "max_value": datetime(1999, 12, 31),
        },
    ),
]


@register(
    "dq_suite_orders",
    oracle=r"""
    WITH base AS (SELECT CAST(COUNT(*) AS BIGINT) ec FROM orders),
    v AS (
      SELECT 'expect_column_to_exist' AS expectation_type, 'o_orderkey' AS column_name,
             CAST(0 AS BIGINT) AS unexpected_count
      UNION ALL
      SELECT 'expect_column_values_to_not_be_null', 'o_orderkey',
             CAST(COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'expect_column_values_to_be_unique', 'o_orderkey',
             CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'expect_column_values_to_be_in_set', 'o_orderstatus',
             CAST(COUNT(CASE WHEN o_orderstatus IS NOT NULL
                             AND o_orderstatus NOT IN ('O','F','P') THEN 1 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'expect_column_values_to_match_regex', 'o_orderpriority',
             CAST(COUNT(CASE WHEN o_orderpriority IS NOT NULL
                             AND NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
                        THEN 1 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'expect_column_values_to_be_between', 'o_totalprice',
             CAST(COUNT(CASE WHEN o_totalprice IS NOT NULL
                             AND (o_totalprice < 0 OR o_totalprice > 100000) THEN 1 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'expect_column_values_to_be_between', 'o_orderdate',
             CAST(COUNT(CASE WHEN o_orderdate IS NOT NULL
                             AND (o_orderdate < TIMESTAMP '1995-01-01'
                               OR o_orderdate > TIMESTAMP '1999-12-31') THEN 1 END) AS BIGINT)
      FROM orders)
    SELECT v.expectation_type, v.column_name, base.ec AS element_count,
           v.unexpected_count, v.unexpected_count = 0 AS success
    FROM v CROSS JOIN base
    """,
)
def dq_suite_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declarative DQ engine (single-pass agg + stack unpivot) over the
    orders table — every expectation's violation counter rides ONE
    aggregate job regardless of suite size."""
    return suite_violation_counts(table(spark, sf_dir, "orders"), ORDERS_SUITE)


def _orphan_sql(child: str, fk: str, parent: str, pk: str) -> str:
    return f"""
    SELECT '{child}.{fk}->{parent}' AS fk_edge,
           CAST(COUNT(*) AS BIGINT) AS n_child_rows,
           CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_orphans
    FROM {child} c LEFT JOIN {parent} p ON c.{fk} = p.{pk}
    """.strip()


_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


@register(
    "referential_integrity_report",
    oracle="\nUNION ALL\n".join(_orphan_sql(*e) for e in _FK_EDGES),
)
def referential_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-schema foreign-key orphan audit in one result: for every FK
    edge of the star schema, the child row count and how many children
    point at a missing parent. Each edge is a left join + conditional
    count; dimension parents broadcast (AQE), the two lineitem fact edges
    shuffle on the key. This is the load-validation DQ report a warehouse
    runs after ingest — the engine-level generalization of the
    reference's single-table count checks (SURVEY.md §2.11 C5)."""
    parts = []
    for child, fk, parent, pk in _FK_EDGES:
        c = table(spark, sf_dir, child).select(F.col(fk))
        p = table(spark, sf_dir, parent).select(F.col(pk))
        joined = c.join(p, c[fk] == p[pk], "left")
        parts.append(
            joined.agg(
                F.lit(f"{child}.{fk}->{parent}").alias("fk_edge"),
                F.count(F.lit(1)).alias("n_child_rows"),
                F.sum(F.col(pk).isNull().cast("long")).alias("n_orphans"),
            )
        )
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out


_EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


@register(
    "column_completeness_report",
    oracle="SELECT "
    + ", ".join(
        [
            "CAST(COUNT(*) AS BIGINT) AS n_rows",
            *(
                f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
                f" AS nulls_{c}"
                for c in _EVENT_COLS
            ),
        ]
    )
    + " FROM events",
)
def column_completeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null census of the events table in ONE aggregate — the
    completeness half of a DQ dashboard (the expectation engine in
    aos.operators.dq asserts thresholds; this reports the raw counts).
    All columns ride a single scan with map-side partials; adding a
    column adds an accumulator, not a pass."""
    ev = table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
            for c in _EVENT_COLS
        ],
    )
