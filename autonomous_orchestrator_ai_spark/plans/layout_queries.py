"""Data-layout queries (operators/layout.py) — the Z-order key verified
bit-for-bit against a DuckDB replica of the same shift/mask arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.layout import (
    column_bounds,
    zorder_key,
)
from autonomous_orchestrator_ai_spark.operators.partitioning import (
    ensure_min_parallelism,
)
from autonomous_orchestrator_ai_spark.plans.registry import register, table

_BITS = 12
_MAXC = (1 << _BITS) - 1

# bit b of scaled column i -> key position b*2 + i (two columns)
_INTERLEAVE_SQL = " | ".join(
    f"(((s{i} >> {b}) & 1) << {b * 2 + i})"
    for b in range(_BITS)
    for i in (0, 1)
)

_SCALE_SQL = """
    CAST(LEAST(GREATEST(FLOOR((CAST({col} AS DOUBLE) - mn{i}) * {maxc}
                              / (mx{i} - mn{i})), 0), {maxc}) AS BIGINT)
""".strip()


@register(
    "zorder_curve_sample",
    oracle=f"""
    WITH b AS (
      SELECT CAST(MIN(user_id) AS DOUBLE) AS mn0, CAST(MAX(user_id) AS DOUBLE) AS mx0,
             CAST(MIN(value) AS DOUBLE) AS mn1, CAST(MAX(value) AS DOUBLE) AS mx1
      FROM events),
    s AS (
      SELECT event_id,
             {_SCALE_SQL.format(col="user_id", i=0, maxc=_MAXC)} AS s0,
             {_SCALE_SQL.format(col="value", i=1, maxc=_MAXC)} AS s1
      FROM events, b)
    SELECT event_id, CAST({_INTERLEAVE_SQL} AS BIGINT) AS zval
    FROM s ORDER BY zval, event_id LIMIT 50
    """,
)
def zorder_curve_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Z-order clustering key (operators.layout.zorder_key) on events
    (user_id, value): the 50 events nearest the curve origin. The oracle
    recomputes the min-max scaling + bit interleave in DuckDB — the key is
    engine-exact integer arithmetic, which is what makes the layout
    reproducible across writers."""
    events = ensure_min_parallelism(table(spark, sf_dir, "events"))
    bounds = column_bounds(events, ["user_id", "value"])
    z = zorder_key(["user_id", "value"], bounds, _BITS)
    return (
        events.select("event_id", z.alias("zval"))
        .orderBy("zval", "event_id")
        .limit(50)
    )
