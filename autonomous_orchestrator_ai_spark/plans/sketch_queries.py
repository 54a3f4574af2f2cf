"""DDSketch quantile-sketch queries (operators/ddsketch.py).

Three registered surfaces, each hash-exact against DuckDB:
- ``ddsketch_value_quantiles`` — grouped quantiles straight from a sketch;
- ``ddsketch_merge_identity`` — sketches built on disjoint halves and
  MERGED answer identically to one whole-table sketch (the mergeability
  law, checked as an oracle rather than asserted in prose);
- ``ddsketch_accuracy_contract`` — the paper's relative-error guarantee
  measured against exact type-1 quantiles on real data.

The sketch itself is deterministic (no RNG, no order-dependence: the
bucket snap rule in operators/ddsketch.py), so unlike most sketch
implementations these are full value-hash oracles, not rows-only checks.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.ddsketch import (
    dd_gamma,
    ddsketch_build,
    ddsketch_merge,
    ddsketch_quantiles,
)
from autonomous_orchestrator_ai_spark.plans.registry import register, table

_ALPHA = 0.01
_GAMMA = dd_gamma(_ALPHA)
_LNG = repr(math.log(_GAMMA))
_G = repr(_GAMMA)
_GP1 = repr(_GAMMA + 1.0)


def _sketch_sql(source_sql: str, value: str, group: str) -> str:
    """Shared oracle scaffold: sketch build + cumulative walk + rank pick,
    mirroring ddsketch_build/ddsketch_quantiles bucket-for-bucket. ``group``
    is a column name ('' for global)."""
    gsel = f"{group}, " if group else ""
    gpart = f"PARTITION BY {group}" if group else ""
    gpart_q = f"PARTITION BY {gsel} q" if group else "PARTITION BY q"
    return f"""
    s AS (
      SELECT {gsel}
             CASE WHEN {value} > 0 THEN 1 WHEN {value} < 0 THEN -1
                  ELSE 0 END AS sign,
             CASE WHEN {value} <> 0
                  THEN CAST(ceil(round(ln(abs({value})) / {_LNG}, 9)) AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS bucket,
             COUNT(*) AS cnt
      FROM ({source_sql}) WHERE {value} IS NOT NULL
      GROUP BY ALL),
    c AS (
      SELECT {gsel} sign, bucket, cnt,
             SUM(cnt) OVER ({gpart} ORDER BY sign, sign * bucket
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER ({gpart}) AS n
      FROM s),
    r AS (
      SELECT c.*, CAST(qv.q AS DOUBLE) AS q,
             CAST(floor(CAST(qv.q AS DOUBLE) * (n - 1)) AS BIGINT) + 1
               AS rnk
      FROM c CROSS JOIN (VALUES (0.5), (0.9), (0.99)) qv(q)),
    hit AS (
      SELECT {gsel} q, sign, bucket,
             ROW_NUMBER() OVER ({gpart_q}
                                ORDER BY sign, sign * bucket) rn
      FROM r WHERE cum >= rnk)
    """


_EST_SQL = (
    f"ROUND(CASE WHEN sign = 0 THEN 0.0 "
    f"ELSE sign * 2.0 * power({_G}, bucket) / {_GP1} END, 4)"
)


@register(
    "ddsketch_value_quantiles",
    oracle=f"""
    WITH {_sketch_sql("SELECT event_type, value FROM events", "value", "event_type")}
    SELECT event_type, q, {_EST_SQL} AS est
    FROM hit WHERE rn = 1
    """,
)
def ddsketch_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of events.value per event_type answered from a
    DDSketch (α=1%) — the corpus-scale quantile path: one map-combined
    groupBy builds the sketch (≤ ~2k rows per type regardless of data
    size), a bounded window walk answers the quantiles. Hash-exact vs the
    same sketch re-derived in SQL."""
    ev = table(spark, sf_dir, "events")
    sk = ddsketch_build(ev, "value", ["event_type"], _ALPHA)
    return ddsketch_quantiles(sk, [0.5, 0.9, 0.99], ["event_type"], _ALPHA)


@register(
    "ddsketch_merge_identity",
    oracle=f"""
    WITH {_sketch_sql("SELECT l_extendedprice FROM lineitem", "l_extendedprice", "")}
    SELECT q, {_EST_SQL} AS est
    FROM hit WHERE rn = 1
    """,
)
def ddsketch_merge_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability as an oracle: sketch lineitem prices in two DISJOINT
    halves (orderkey parity — at scale: per-shard/per-day sketches),
    merge with ``ddsketch_merge`` (bucket-wise sum), answer quantiles.
    The oracle computes the same quantiles from ONE whole-table sketch —
    hash equality IS the lossless-merge law. A sketch that lost or
    double-counted a bucket in the union, or whose merge depended on
    order, breaks this."""
    li = table(spark, sf_dir, "lineitem")
    even = li.where(F.col("l_orderkey") % 2 == 0)
    odd = li.where(F.col("l_orderkey") % 2 == 1)
    merged = ddsketch_merge(
        ddsketch_build(even, "l_extendedprice", (), _ALPHA),
        ddsketch_build(odd, "l_extendedprice", (), _ALPHA),
    )
    return ddsketch_quantiles(merged, [0.5, 0.9, 0.99], (), _ALPHA)


@register(
    "ddsketch_accuracy_contract",
    oracle=f"""
    WITH {_sketch_sql("SELECT event_type, value FROM events", "value", "event_type")},
    est AS (
      SELECT event_type, q, {_EST_SQL} AS est
      FROM hit WHERE rn = 1),
    ordered AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) rnk,
             COUNT(*) OVER (PARTITION BY event_type) n
      FROM events WHERE value IS NOT NULL),
    exact AS (
      SELECT o.event_type, CAST(qv.q AS DOUBLE) AS q, o.value AS exact_v
      FROM ordered o JOIN (VALUES (0.5), (0.9), (0.99)) qv(q)
        ON o.rnk = CAST(floor(CAST(qv.q AS DOUBLE) * (o.n - 1)) AS BIGINT) + 1)
    SELECT e.event_type, e.q, e.est,
           ROUND(x.exact_v, 4) AS exact_v,
           abs(e.est - x.exact_v) <= {_ALPHA} * abs(x.exact_v)
             AS within_tol
    FROM est e JOIN exact x
      ON e.event_type = x.event_type AND e.q = x.q
    """,
)
def ddsketch_accuracy_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DDSketch guarantee measured, not asserted: per (event_type, q)
    the sketch estimate sits within α·|x_q| of the EXACT type-1 quantile
    (same rank rule as the sketch, so the bound is the paper's). The
    exact side sorts per group — affordable as a TEST oracle only; at
    corpus scale the sketch replaces exactly this sort, which is the
    point. All within_tol rows must read true (pytest pins it); the
    driver hash-checks the full row."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    sk = ddsketch_build(ev, "value", ["event_type"], _ALPHA)
    est = ddsketch_quantiles(sk, [0.5, 0.9, 0.99], ["event_type"], _ALPHA)

    w = Window.partitionBy("event_type").orderBy("value")
    wn = Window.partitionBy("event_type")
    ordered = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    qs = F.explode(
        F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    ).alias("q")
    exact = (
        ordered.select("event_type", "value", "rnk", "n", qs)
        .where(
            F.col("rnk")
            == F.floor(F.col("q") * (F.col("n") - 1)).cast("long") + 1
        )
        .select("event_type", "q", F.col("value").alias("exact_v"))
    )
    return est.join(exact, ["event_type", "q"]).select(
        "event_type",
        "q",
        "est",
        F.round("exact_v", 4).alias("exact_v"),
        (
            F.abs(F.col("est") - F.col("exact_v"))
            <= _ALPHA * F.abs(F.col("exact_v"))
        ).alias("within_tol"),
    )
