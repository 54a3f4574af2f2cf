"""Iterative graph queries with DuckDB-oracle replicas.

PageRank is the one shape in the repo that is genuinely ITERATIVE — the
plan is a loop of join+agg rounds — and it is still oracle-exact because
the iteration count is fixed: the DuckDB replica simply unrolls the five
rounds as chained CTEs. (Connected components, the other iterative
operator, is oracled via DuckDB's recursive CTE in ``near_dup_clusters``.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.graph import pagerank
from autonomous_orchestrator_ai_spark.plans.registry import register, table

_ITERATIONS = 5


def _unrolled_pagerank_sql(iterations: int) -> str:
    # One CTE per round; constants are CAST to DOUBLE because bare 0.85 is
    # DECIMAL in DuckDB and decimal division would diverge from Spark's
    # double arithmetic. Every CTE is AS MATERIALIZED: DuckDB inlines
    # single-reference CTEs, and inlining p5 -> p4 -> ... -> p0 would
    # re-derive the edge self-join once per unrolled level (measured: a
    # spill past 80 GB of temp at sf1; materialized, the sweep is seconds).
    ctes = [
        """
    edges AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    ),
    nodes AS MATERIALIZED (SELECT s AS k FROM edges UNION SELECT d FROM edges),
    nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    deg AS MATERIALIZED (SELECT s, COUNT(*) AS out_deg FROM edges GROUP BY s),
    p0 AS MATERIALIZED (
      SELECT k, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS r FROM nodes)
    """.strip()
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""
    p{i} AS MATERIALIZED (
      SELECT nodes.k,
             CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
               + CAST(0.85 AS DOUBLE) * COALESCE(m.mass, CAST(0 AS DOUBLE)) AS r
      FROM nodes LEFT JOIN (
        SELECT e.d AS k, SUM(p.r / deg.out_deg) AS mass
        FROM edges e JOIN p{i - 1} p ON e.s = p.k JOIN deg ON deg.s = e.s
        GROUP BY e.d
      ) m ON nodes.k = m.k
    )
    """.strip()
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT k AS p_partkey, ROUND(r, 8) AS pagerank
    FROM p{iterations} ORDER BY p_partkey
    """
    )


@register(
    "part_copurchase_pagerank", oracle=_unrolled_pagerank_sql(_ITERATIONS)
)
def part_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph (parts appearing in the
    same order are linked), 5 power-iteration rounds, damping 0.85.

    Edge generation is an equi-self-join on l_orderkey (orders hold <= 7
    items, so fan-out is bounded per key); the rank state is (node, rank)
    only. Scores are rounded to 8dp — iteration noise from summation order
    is ~1e-16 relative, far below the rounding grid.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
    )
    pr = pagerank(edges, iterations=_ITERATIONS)
    return pr.select(
        F.col("node").alias("p_partkey"),
        F.round("rank", 8).alias("pagerank"),
    ).orderBy("p_partkey")
