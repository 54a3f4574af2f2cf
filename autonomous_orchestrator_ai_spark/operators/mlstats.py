"""Feature-statistics operators: mutual information, WOE/IV, RFM.

Dataset-understanding math a feature/label pipeline runs before training:
how much one categorical column says about another (mutual information —
the drift/leak detector between a feature and a label or between two
pipeline stages), how a categorical feature separates a binary target
(weight of evidence / information value — the classical scorecard-feature
screen), and behavioral segmentation (RFM quartiles).

All three are pure DataFrame aggregation pipelines — count shuffles over
(x), (y), (x, y) keys plus bounded-cardinality post-processing — so they
run at corpus scale with one to two exchanges and no Python in the hot
path. Extends the reference's per-column DQ profiling (SURVEY.md §2.10)
to cross-column statistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["mutual_information", "woe_iv", "rfm_segments"]


def mutual_information(
    df: DataFrame, x_col: str | Column, y_col: str | Column,
    x_name: str = "x", y_name: str = "y",
) -> DataFrame:
    """One-row frame: n, entropy of X and Y, their mutual information
    (nats) and the normalized MI ``mi / sqrt(h_x · h_y)`` (0 = independent,
    1 = bijective). NULL cells count as their own category (a NULL pattern
    that tracks the label IS signal — dropping it would hide a leak).

    One (x, y) count shuffle; marginals derive from the joint via two
    bounded re-aggregations, so the corpus is scanned once.
    """
    # categories ride through equi-joins, where NULL keys never match —
    # map NULL to a sentinel so the NULL category survives the marginal
    # joins (cast to string first: MI only needs category identity)
    def _cat(c: str | Column) -> Column:
        col = c if isinstance(c, Column) else F.col(c)
        return F.coalesce(col.cast("string"), F.lit("<NULL>"))

    x = _cat(x_col).alias("__x")
    y = _cat(y_col).alias("__y")
    joint = df.select(x, y).groupBy("__x", "__y").agg(
        F.count(F.lit(1)).alias("nxy")
    )
    n = joint.agg(F.sum("nxy").alias("n"))
    px = joint.groupBy("__x").agg(F.sum("nxy").alias("nx"))
    py = joint.groupBy("__y").agg(F.sum("nxy").alias("ny"))
    nn = F.col("n").cast("double")
    terms = (
        joint.join(px, "__x")
        .join(py, "__y")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("n"),
            (F.col("nxy") / nn * F.log(
                (F.col("nxy") * nn) / (F.col("nx") * F.col("ny"))
            )).alias("mi_term"),
        )
    )
    hx = px.crossJoin(F.broadcast(n)).agg(
        (-F.sum(F.col("nx") / nn * F.log(F.col("nx") / nn))).alias("h")
    )
    hy = py.crossJoin(F.broadcast(n)).agg(
        (-F.sum(F.col("ny") / nn * F.log(F.col("ny") / nn))).alias("h")
    )
    mi = terms.groupBy("n").agg(F.sum("mi_term").alias("mi"))
    return (
        mi.crossJoin(hx.select(F.col("h").alias("h_x")))
        .crossJoin(hy.select(F.col("h").alias("h_y")))
        .select(
            F.lit(x_name).alias("x_col"),
            F.lit(y_name).alias("y_col"),
            F.col("n").cast("bigint").alias("n"),
            F.round("h_x", 6).alias("entropy_x"),
            F.round("h_y", 6).alias("entropy_y"),
            F.round("mi", 6).alias("mi_nats"),
            F.round(
                F.col("mi") / F.sqrt(F.col("h_x") * F.col("h_y")), 6
            ).alias("normalized_mi"),
        )
    )


def woe_iv(
    df: DataFrame,
    feature_col: str,
    target: Column,
    *,
    smoothing: float = 0.5,
) -> DataFrame:
    """Weight of evidence + information value per feature category.

    ``woe = ln((events_i/events_tot) / (non_events_i/non_events_tot))``
    with additive ``smoothing`` on every cell so an all-one-class
    category stays finite; ``iv_contrib = (event_share − non_event_share)
    · woe`` and the feature's total IV is ``SUM(iv_contrib)`` (< 0.02
    useless, > 0.5 suspiciously strong — the classical screen for a
    leaky feature). One count shuffle on the feature key; totals are a
    broadcast scalar.
    """
    t = target.cast("int")
    per_cat = df.groupBy(F.col(feature_col).alias("category")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(t).alias("n_event"),
        F.sum(1 - t).alias("n_non_event"),
    )
    tot = per_cat.agg(
        F.sum("n_event").alias("tot_event"),
        F.sum("n_non_event").alias("tot_non_event"),
        F.count(F.lit(1)).alias("n_cats"),
    )
    ev = (F.col("n_event") + smoothing) / (
        F.col("tot_event") + smoothing * F.col("n_cats")
    )
    ne = (F.col("n_non_event") + smoothing) / (
        F.col("tot_non_event") + smoothing * F.col("n_cats")
    )
    return (
        per_cat.crossJoin(F.broadcast(tot))
        .select(
            "category",
            "n",
            "n_event",
            "n_non_event",
            F.round(F.log(ev / ne), 6).alias("woe"),
            F.round((ev - ne) * F.log(ev / ne), 6).alias("iv_contrib"),
        )
    )


def rfm_segments(
    orders: DataFrame,
    as_of: str,
    *,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_tiles: int = 4,
) -> DataFrame:
    """Per-customer RFM quartile scores: recency (days from last order to
    ``as_of``), frequency (order count), monetary (total spend), each
    ntile(4)-scored with 4 = best. The tie-break on the customer key makes
    every ntile assignment a total order — deterministic across engines.

    One groupBy(customer) shuffle builds the RFM base; the three ranking
    windows run over the already-aggregated per-customer table (one row
    per customer, unpartitioned windows — acceptable because ntile needs
    a global rank anyway; at 100 TB the base table is customers, not
    orders, and a 1e8-row sort is routine). Returns one row per customer:
    (custkey, recency_days, frequency, monetary, r, f, m, segment).
    """
    base = orders.groupBy(F.col(cust_col).alias("custkey")).agg(
        F.datediff(F.lit(as_of).cast("date"), F.max(date_col)).alias(
            "recency_days"
        ),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum(F.col(amount_col).cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("monetary"),
    )
    # recency: smaller = better -> DESC so ntile bucket 4 = most recent
    wr = Window.orderBy(F.desc("recency_days"), F.asc("custkey"))
    wf = Window.orderBy(F.asc("frequency"), F.asc("custkey"))
    wm = Window.orderBy(F.asc("monetary"), F.asc("custkey"))
    return (
        base.withColumn("r", F.ntile(n_tiles).over(wr))
        .withColumn("f", F.ntile(n_tiles).over(wf))
        .withColumn("m", F.ntile(n_tiles).over(wm))
        .withColumn(
            "segment",
            F.concat(
                F.lit("R"), F.col("r"), F.lit("F"), F.col("f"),
                F.lit("M"), F.col("m"),
            ),
        )
    )
