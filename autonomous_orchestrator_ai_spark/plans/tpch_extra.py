"""Second batch of TPC-H-style shapes over the driver's star schema.

The testdata is a *reduced* TPC-H (no partsupp table; lineitem lacks
commitdate/receiptdate/shipmode; orders lacks o_comment), so the queries
that depend on those (Q2, Q11, and parts of Q9/Q12/Q16/Q20/Q21) are
re-expressed with the same PLAN SHAPE on the available columns — each
docstring states the adaptation. Like plans/tpch.py these exist because
the reference engine performs no joins (SURVEY.md §2.3); they widen the
relational surface the Spark engine gives for free.

Scale notes applying to the whole module:
- every dimension side (nation x2, region, supplier, customer, part,
  per-key aggregate outputs) is explicitly ``F.broadcast``;
- the only unavoidable shuffles are fact-fact (lineitem⋈orders) and the
  final low-cardinality aggregations, whose shuffle volume is O(#groups)
  after partial aggregation;
- at 100 TB, lineitem and orders would be bucketed on orderkey to turn
  the fact-fact join exchange-free (operators/skew.py provides that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.plans.registry import (
    exact_money_sum as _exact_money_sum,
)
from autonomous_orchestrator_ai_spark.plans.registry import register, table


@register(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
      AND n1.n_name <> n2.n_name
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: cross-border shipping volume by (supplier nation, customer
    nation, year). Adaptation: all nation pairs instead of a fixed pair
    (the synthetic nations are uniform; a fixed pair tests nothing extra).
    Both nation sides broadcast; the self-join on nation is disambiguated
    by aliasing before the join — at scale nation is ~25 rows, so the two
    copies are two broadcast hashtables, never a shuffle."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
    ).agg(
        _exact_money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                              THEN CAST(volume AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = n2.n_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'STANDARD') t
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's market share of STANDARD-part revenue sold
    into EUROPE customers, per order-year. The conditional-sum / total-sum
    ratio rides a single aggregation (no second pass); seven of the eight
    join sides are broadcast dims."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n_cust = (
        table(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    n_supp = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
    )
    dec_vol = volume.cast("decimal(18,4)")
    return joined.groupBy(F.year("o_orderdate").cast("int").alias("o_year")).agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", dec_vol).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                )
            ).cast("double")
            / F.sum(dec_vol).cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "tpch_q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS sum_profit
    FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on widget-family parts by supplier nation and
    year. Adaptation: the testdata has no partsupp, so profit omits the
    ps_supplycost * l_quantity term (reduced schema) — the plan shape
    (LIKE-filtered part dim broadcast into the fact, two more broadcast
    dims, two-key agg) is Q9's."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    orders = table(spark, sf_dir, "orders")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("int").alias("o_year"),
    ).agg(
        _exact_money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "sum_profit"
        )
    )


@register(
    "tpch_q12_priority_shipping",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts of high- vs low-priority orders
    per lineitem class. Adaptation: the testdata lacks l_shipmode /
    commitdate / receiptdate, so the grouping key is l_returnflag and the
    date predicate is on l_shipdate — the signature (join + CASE-bucketed
    two-way counts) is Q12's."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) t
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed 0, 1, 2, ... orders — the
    left-outer join keeps order-less customers, COUNT(col) skips their
    NULLs, then a second aggregation histograms the counts. Adaptation:
    the exclusion predicate is on o_orderpriority (no o_comment column).
    Two shuffles total (per-customer, then per-count); the second input is
    one row per customer and at 100 TB the histogram's partial aggregation
    collapses it before the exchange."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: revenue per supplier over one quarter, then the
    supplier(s) achieving the maximum — a scalar subquery over an
    aggregate, decorrelated as a 1-row broadcast cross join. Revenue is
    rounded to 2dp BEFORE the max/equality so the comparison is stable
    across engines and summation orders."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _exact_money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    supp = table(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(rev), F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q16_supplier_part_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each
    (brand, type, size). Adaptation: the part-supplier association comes
    from lineitem (no partsupp table), and the supplier-complaint
    anti-filter is dropped (no s_comment). COUNT(DISTINCT) rides Spark's
    two-phase distinct-aggregate expansion; the part dim filter is
    broadcast and its IN-list predicate pushes to the parquet scan."""
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_bulk_suppliers",
    oracle="""
    WITH per_supp AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'large%'
        AND l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, ROUND(qty, 2) AS shipped_qty
    FROM supplier JOIN per_supp ON s_suppkey = l_suppkey
    WHERE qty > (SELECT 0.5 * AVG(qty) FROM per_supp)
    """,
)
def tpch_q20_bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved an outsized share of a part
    family in a year. Adaptation: the availability threshold compares each
    supplier's shipped quantity of 'large*' parts against half the
    per-supplier average (no partsupp.ps_availqty); the signature —
    nested aggregate, scalar threshold subquery, semi-join back to the
    supplier dim — is Q20's."""
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("large%"))
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    per_supp = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("qty"))
    )
    threshold = per_supp.agg((0.5 * F.avg("qty")).alias("thr"))
    supp = table(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(per_supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .crossJoin(F.broadcast(threshold))
        .filter(F.col("qty") > F.col("thr"))
        .select("s_suppkey", "s_name", F.round("qty", 2).alias("shipped_qty"))
    )


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH order_stats AS (
      SELECT l_orderkey AS ok,
             MAX(l_shipdate) AS last_ship,
             COUNT(DISTINCT l_suppkey) AS n_supp
      FROM lineitem GROUP BY l_orderkey)
    SELECT s_name, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS numwait
    FROM lineitem
      JOIN order_stats ON ok = l_orderkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
    WHERE o_orderstatus = 'F' AND n_supp >= 2 AND l_shipdate = last_ship
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who held up multi-supplier orders.
    Adaptation: 'held up' = shipped last (l_shipdate equals the order's max
    shipdate) on an o_orderstatus='F' order with >= 2 distinct suppliers —
    the commitdate/receiptdate columns Q21 uses don't exist here. The
    EXISTS/NOT-EXISTS pair becomes one per-order aggregate joined back
    (same decorrelation Catalyst performs); ties on last shipdate count
    for every tied supplier in both engines."""
    li = table(spark, sf_dir, "lineitem")
    order_stats = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.max("l_shipdate").alias("last_ship"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = table(spark, sf_dir, "supplier")
    return (
        li.join(order_stats, F.col("l_orderkey") == F.col("ok"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter((F.col("n_supp") >= 2) & (F.col("l_shipdate") == F.col("last_ship")))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT l_partkey AS bp, MIN(unit_cost) AS min_cost
      FROM costs GROUP BY l_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           min_cost AS unit_cost
    FROM costs
      JOIN best ON l_partkey = bp AND unit_cost = min_cost
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
    ORDER BY s_acctbal DESC, p_partkey, s_name
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the cheapest supplier per part within one region —
    correlated per-part MIN, decorrelated as aggregate + equality join-back.
    Adaptation: no partsupp table here, so lineitem is the part↔supplier
    link and 'supply cost' is the observed unit price
    (l_extendedprice / l_quantity, an exact IEEE division in both engines;
    MIN and the equality join-back compare those exact doubles, so ties
    surface every minimal supplier identically in Spark and DuckDB; the
    output keeps the raw double — MIN of a deterministic division is
    bit-identical cross-engine, while ROUND(x, 4) flips at half-way
    boundaries).
    Scale: region→nation→supplier reduce and broadcast into the lineitem
    scan; the two aggregates and the join-back all share one shuffle key
    (l_partkey), so AQE plans agg→agg→join without re-exchanging."""
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = table(spark, sf_dir, "lineitem")
    costs = (
        li.join(F.broadcast(supp.select("s_suppkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = costs.groupBy(F.col("l_partkey").alias("bp")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    part = table(spark, sf_dir, "part")
    return (
        costs.join(
            best,
            (F.col("l_partkey") == F.col("bp"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("min_cost").alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_name"))
        .limit(100)
    )


@register(
    "tpch_q11_important_parts",
    oracle="""
    WITH partval AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS value
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
      WHERE n_name IN ('NATION_7', 'NATION_8')
      GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey,
           CAST(ROUND(value, 2) AS DOUBLE) AS part_value
    FROM partval
    WHERE value > (
      SELECT SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) * 0.001
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
      WHERE n_name IN ('NATION_7', 'NATION_8')
    )
    ORDER BY part_value DESC, partkey
    LIMIT 100
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts holding an outsized share of total value —
    grouped aggregate HAVING-compared against a scalar subquery (global
    sum × fraction). Adaptation: no partsupp, so 'value' is shipped
    revenue of the part from the filtered suppliers' lineitems.
    Scale: the scalar total re-aggregates the per-part values (one extra
    reduce over #parts rows, NOT a second lineitem scan) and is broadcast
    into the HAVING filter. Sums accumulate as DECIMAL(18,4) (exact under
    any order — registry.exact_money_sum rationale); the 0.001 threshold
    multiply happens in double identically in both engines."""
    nation = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_7", "NATION_8")
    )
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = table(spark, sf_dir, "lineitem")
    partval = (
        li.join(F.broadcast(supp.select("s_suppkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("value")
        )
    )
    total = partval.agg(F.sum("value").alias("grand"))
    return (
        partval.join(F.broadcast(total))
        .filter(F.col("value") > F.col("grand") * F.lit(0.001))
        .select("partkey", F.round("value", 2).cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), F.asc("partkey"))
        .limit(100)
    )
