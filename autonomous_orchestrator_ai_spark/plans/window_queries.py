"""Window-function / time-bucket / set-operation queries (SURVEY.md §2.5-2.7).

The reference imported ``window``/``max``/``min`` but never used them
(ingest_transform.py:17) and did its "latest incident" picks client-side
(incident_store.py:210-220). These queries provide that surface natively:
ranking windows, lag-based sessionization, tumbling time buckets, as-of
joins, and relational set ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.asof import asof_join
from autonomous_orchestrator_ai_spark.operators.rangejoin import range_join
from autonomous_orchestrator_ai_spark.plans.registry import (
    exact_money_sum,
    register,
    table,
)

SESSION_GAP_SECONDS = 1800  # 30-minute inactivity gap


@register(
    "top_spenders_per_type",
    oracle="""
    WITH sums AS (
      SELECT event_type, user_id, CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
      FROM events GROUP BY event_type, user_id
    ), ranked AS (
      SELECT event_type, user_id, total_value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY total_value DESC, user_id) AS rank
      FROM sums
    )
    SELECT event_type, user_id, total_value, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def top_spenders_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: agg then rank (reference O1/O2 did this client-side;
    here it's Window.partitionBy + row_number, rank<=K pushed as a window
    limit by Catalyst)."""
    sums = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(exact_money_sum(F.col("value")).alias("total_value"))
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("total_value"), F.asc("user_id"))
    return (
        sums.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
    )


@register(
    "latest_event_per_user",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, event_type, value,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_id, event_type, value, ts_str
    FROM ranked WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Latest row per key' — the reference's ORDER BY created_at DESC +
    client-side pick (incident_store.py:210-220) done as a ranking window
    (also the SURVEY §7.4 'latest incident state' pattern)."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        )
    )


@register(
    "user_sessionization",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR date_diff('second',
                                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                                    ts) > {SESSION_GAP_SECONDS}
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM gaps GROUP BY user_id
    """,
)
def user_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + gap threshold (guide 'Common OLAP patterns');
    single shuffle on user_id serves both the window and the final agg."""
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > SESSION_GAP_SECONDS),
        1,
    ).otherwise(0)
    return (
        table(spark, sf_dir, "events")
        .withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "daily_event_counts",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day event-time buckets via ``F.window`` — the windowed
    aggregation the reference imported but never built (SURVEY.md §2.9 T7).
    The same expression runs under a streaming groupBy with a watermark."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_money_sum(F.col("value")).alias("total_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "hourly_value_buckets",
    oracle="""
    SELECT CAST(FLOOR(FLOOR(epoch(ts)) / 21600) AS BIGINT) AS bucket6h,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(AVG(value), 4) AS avg_value
    FROM events GROUP BY 1
    """,
)
def hourly_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-aligned 6-hour tumbling buckets (sliding/tumbling windows of
    arbitrary width; numeric bucket id keeps the oracle engine-neutral)."""
    ev = table(spark, sf_dir, "events")
    bucket = F.floor(F.unix_timestamp("ts") / 21600).alias("bucket6h")
    return ev.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


@register(
    "purchasers_without_errors",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def purchasers_without_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational EXCEPT (SURVEY.md §2.7 — free from Spark, exposed for the
    oracle suite)."""
    ev = table(spark, sf_dir, "events")
    purchasers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    errorers = ev.filter(F.col("event_type") == "error").select("user_id")
    return purchasers.subtract(errorers)  # EXCEPT (distinct semantics)


@register(
    "signup_and_purchase_users",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'signup'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def signup_and_purchase_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational INTERSECT."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id")
        .intersect(ev.filter(F.col("event_type") == "purchase").select("user_id"))
    )


@register(
    "session_window_stats",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_SECONDS}
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps)
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (``F.session_window`` — 30-min gap merge).
    Works identically under a streaming groupBy with a watermark; the oracle
    re-derives sessions with the lag/cumsum formulation, proving the two
    constructions equivalent."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_SECONDS} seconds").alias("win"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


@register(
    "purchases_in_signup_window",
    oracle="""
    SELECT p.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases_in_window,
           CAST(ROUND(SUM(CAST(p.value AS DECIMAL(18,4))), 2) AS DOUBLE) AS window_revenue
    FROM (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, ts AS start, ts + INTERVAL 1 HOUR AS "end"
          FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.start AND p.ts < s."end"
    GROUP BY p.user_id
    """,
)
def purchases_in_signup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join (custom operator, operators/rangejoin.py):
    purchases landing inside any [signup, signup+1h) window, per user. The
    Spark side buckets ranges to make the join equi AND co-keys it on
    user_id (``extra_keys`` — joining on the time bucket alone would
    cross every user's purchases with every user's signups inside each
    bucket, a per-bucket quadratic that grows with user density); the
    oracle is DuckDB's plain inequality join."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end"),
    )
    joined = range_join(
        purchases,
        signups,
        "ts",
        "start",
        "end",
        bucket_seconds=3600,
        extra_keys=["user_id"],
    )
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases_in_window"),
        exact_money_sum(F.col("value")).alias("window_revenue"),
    )


@register(
    "purchase_asof_signup",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts_str,
           CAST(date_diff('second', s.ts, p.ts) AS BIGINT) AS seconds_since_signup
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def purchase_asof_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator, operators/asof.py): for each purchase,
    the user's most recent signup at-or-before it. Oracle uses DuckDB's
    native ASOF JOIN; the Spark side is the union+running-last composition."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    joined = asof_join(
        purchases, signups, on="user_id", left_ts="ts", right_ts="ts", right_cols=[]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts_asof", "yyyy-MM-dd HH:mm:ss").alias("signup_ts_str"),
        (F.unix_timestamp("ts") - F.unix_timestamp("ts_asof")).alias("seconds_since_signup"),
    )


@register(
    "revenue_mom_growth",
    oracle="""
    WITH m AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS revenue
      FROM orders GROUP BY 1)
    SELECT month, revenue,
           CAST(ROUND(CAST(revenue - LAG(revenue) OVER (ORDER BY month)
                  AS DECIMAL(18,4)), 2) AS DOUBLE) AS mom_change,
           ROUND(revenue / NULLIF(LAG(revenue) OVER (ORDER BY month), 0) - 1.0,
                 6) AS mom_growth
    FROM m
    """,
)
def revenue_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth, written in PURE ``spark.sql`` over
    registered views (plans.registry.register_views) — the SQL half of the
    engine's DataFrame/SQL surface; Catalyst plans it identically to the
    DataFrame form. The LAG window is global but runs over one row per
    month (~tens of rows after the pre-aggregate), so the single-partition
    sort is bounded by the month count, never the orders row count."""
    from autonomous_orchestrator_ai_spark.plans.registry import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH m AS (
          SELECT date_format(o_orderdate, 'yyyy-MM') AS month,
                 CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                   AS DOUBLE) AS revenue
          FROM orders GROUP BY 1)
        SELECT month, revenue,
               CAST(ROUND(CAST(revenue - LAG(revenue)
                      OVER (PARTITION BY 1 ORDER BY month)
                      AS DECIMAL(18,4)), 2) AS DOUBLE) AS mom_change,
               ROUND(revenue / NULLIF(LAG(revenue)
                      OVER (PARTITION BY 1 ORDER BY month), 0) - 1.0,
                     6) AS mom_growth
        FROM m
        """
    )


@register(
    "order_price_cume_deciles",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority,
             CEIL(cume_dist() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice, o_orderkey) * 10)
               AS decile
      FROM orders)
    SELECT o_orderpriority, CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM r GROUP BY 1, 2
    """,
)
def order_price_cume_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist-based decile bucketing of order value within each
    priority class — the cumulative-distribution window function (rank/n
    as an exact rational evaluated identically in both engines; the
    o_orderkey tie-break makes the ordering total). Partitioned windows:
    each priority's sort runs independently. Complements the NTILE
    (equal-count) and percentile (order-statistic) shapes already in the
    catalog — cume_dist buckets by VALUE POSITION, so ties land in the
    same bucket."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    r = orders.select(
        "o_orderpriority",
        F.ceil(F.cume_dist().over(w) * 10).alias("decile"),
    )
    return r.groupBy("o_orderpriority", "decile").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "top_value_days_with_ties",
    oracle="""
    WITH daily AS (
      SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS sy4
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2),
    r AS (
      SELECT event_type, day, sy4,
             RANK() OVER (PARTITION BY event_type ORDER BY sy4 DESC) AS rnk
      FROM daily)
    SELECT event_type, day, CAST(rnk AS INT) AS rnk,
           ROUND(CAST(sy4 AS DOUBLE) / 10000.0, 4) AS day_total
    FROM r WHERE rnk <= 3
    """,
)
def top_value_days_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 revenue days per event_type using RANK (ties share a rank
    and are all kept — the correct semantics for 'best days' leaderboards,
    unlike row_number's arbitrary tie drop). Ranking is over EXACT
    fixed-point daily totals, so tie structure is engine-identical by
    construction. Partitioned window: per-key sorts parallelize."""
    ev = table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    daily = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(
        F.sum(
            F.expr(
                "CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)"
            ).cast("decimal(38,0)")
        ).alias("sy4")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("sy4").desc())
    return (
        daily.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "event_type",
            "day",
            F.col("rnk").cast("int").alias("rnk"),
            F.round(F.col("sy4").cast("double") / 10000.0, 4).alias(
                "day_total"
            ),
        )
    )


@register(
    "first_last_nth_value_by_user",
    oracle="""
    WITH w AS (
      SELECT user_id,
             first_value(value) OVER win AS first_v,
             last_value(value) OVER win AS last_v,
             nth_value(value, 2) OVER win AS second_v,
             COUNT(*) OVER (PARTITION BY user_id) AS n_events
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
    SELECT DISTINCT user_id,
           CAST(n_events AS BIGINT) AS n_events,
           ROUND(first_v, 2) AS first_value,
           ROUND(COALESCE(second_v, first_v), 2) AS second_value,
           ROUND(last_v, 2) AS last_value
    FROM w WHERE user_id < 30
    """,
)
def first_last_nth_value_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / nth_value / last_value over a full-partition frame
    (UNBOUNDED..UNBOUNDED — without it last_value sees only the default
    running frame, the classic window gotcha) per user journey, ordered
    by (ts, event_id) so ties are total. nth_value(2) falls back to the
    first event for single-event users. Restricted to a user slice so the
    distinct projection stays small; the window itself partitions per
    user and parallelizes."""
    ev = table(spark, sf_dir, "events")
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w = ev.select(
        "user_id",
        F.first("value").over(win).alias("first_v"),
        F.last("value").over(win).alias("last_v"),
        F.nth_value("value", 2).over(win).alias("second_v"),
        F.count(F.lit(1))
        .over(Window.partitionBy("user_id"))
        .alias("n_events"),
    )
    return (
        w.where(F.col("user_id") < 30)
        .select(
            "user_id",
            "n_events",
            F.round("first_v", 2).alias("first_value"),
            F.round(F.coalesce("second_v", "first_v"), 2).alias(
                "second_value"
            ),
            F.round("last_v", 2).alias("last_value"),
        )
        .distinct()
    )


@register(
    "busiest_weekday_by_type",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2)
    SELECT event_type,
           arg_max(dow, n * 8 + (7 - dow)) AS busiest_dow,
           MAX(n) AS n_events_busiest
    FROM c GROUP BY event_type
    """,
)
def busiest_weekday_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE via argmax: the busiest day-of-week per
    event_type, ties broken toward the SMALLER weekday by maximizing the
    composite integer key n*8 + (7-dow) — the explicit-tie-break pattern that makes
    'most frequent value' reproducible where a bare mode() aggregate is
    tie-nondeterministic in either engine. Two map-combined aggregations,
    no window, no sort. (DuckDB dayofweek: 0=Sunday; Spark mirrors via
    dayofweek(ts)-1.)"""
    ev = table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    c = ev.groupBy(
        "event_type",
        (F.dayofweek("ts").cast("long") - 1).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return c.groupBy("event_type").agg(
        F.max_by(
            "dow", F.col("n") * 8 + (F.lit(7) - F.col("dow"))
        ).alias("busiest_dow"),
        F.max("n").alias("n_events_busiest"),
    )


@register(
    "error_purchase_correlation",
    oracle="""
    WITH err AS (
      SELECT user_id, ts AS e_ts FROM events WHERE event_type = 'error'),
    pur AS (
      SELECT user_id, ts AS p_ts, value FROM events
      WHERE event_type = 'purchase'),
    pairs AS (
      SELECT e.user_id, e.e_ts, p.p_ts, p.value
      FROM pur p JOIN err e
        ON p.user_id = e.user_id
       AND p.p_ts >= e.e_ts AND p.p_ts < e.e_ts + INTERVAL 10 MINUTE)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS correlated_revenue,
           CAST(ROUND(AVG(date_diff('second', e_ts, p_ts)), 2) AS DOUBLE)
             AS avg_lag_seconds
    FROM pairs
    """,
)
def error_purchase_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-correlation join: purchases landing within 10 minutes AFTER
    an error by the same user — the 'does this failure mode suppress (or
    precede) conversion?' question every event pipeline eventually asks.
    Expressed with the bucketized range join co-keyed on user
    (operators/rangejoin.py): the inequality condition becomes an equi
    join on (time_bucket, user_id) plus a residual filter, so no naive
    inequality join and no per-bucket cross product across users. The lag
    average is computed on exact integer seconds."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("end"),
    )
    joined = range_join(
        purchases,
        errors,
        "ts",
        "start",
        "end",
        bucket_seconds=600,
        extra_keys=["user_id"],
    )
    lag_s = F.unix_timestamp("ts") - F.unix_timestamp("start")
    return joined.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count_distinct("user_id").alias("n_users"),
        exact_money_sum(F.col("value")).alias("correlated_revenue"),
        F.round(F.avg(lag_s), 2).alias("avg_lag_seconds"),
    )
