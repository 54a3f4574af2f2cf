"""Time-series queries: gap-filled dense series (LOCF) and trailing-window
anomaly scoring over the events stream.

The reference's windowed aggregation (ingest_transform.py:198-210) only
emits buckets where data exists and flags anomalies with fixed thresholds
(agent/tools.py decision rules); these queries add the dense-series and
self-calibrating (trailing z-score) forms a monitoring pipeline actually
deploys.

Determinism notes: bucket averages go through the exact-decimal-sum path
(see ``registry.exact_money_sum``) before one IEEE double division, and
the z-score is an explicit sum/sum-of-squares formula — identical
expression trees on identical exact inputs are bit-identical across
engines, so rounding is cosmetic rather than load-bearing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.gapfill import (
    time_bucket_gapfill,
)
from autonomous_orchestrator_ai_spark.plans.registry import register, table

GAPFILL_BUCKET_SECONDS = 3600


@register(
    "hourly_gapfill_locf",
    oracle="""
    WITH b AS (
      SELECT event_type,
             to_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600) AS bucket,
             CAST((2 * SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT))
                   + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE) / 10000.0 AS value_avg
      FROM events WHERE event_type IN ('purchase', 'error') GROUP BY 1, 2),
    bounds AS (SELECT MIN(bucket) AS b0, MAX(bucket) AS b1 FROM b),
    grid AS (
      SELECT t.event_type, g.bucket
      FROM (SELECT DISTINCT event_type FROM b) t
      CROSS JOIN (SELECT unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
                  FROM bounds) g),
    f AS (
      SELECT g.event_type, g.bucket, b.value_avg,
             last_value(b.value_avg IGNORE NULLS)
               OVER (PARTITION BY g.event_type ORDER BY g.bucket) AS value_avg_filled,
             b.value_avg IS NULL AS gap_filled
      FROM grid g LEFT JOIN b USING (event_type, bucket))
    SELECT event_type, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
           value_avg, value_avg_filled, gap_filled
    FROM f
    """,
)
def hourly_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series of average purchase/error value with
    last-observation-carried-forward gap fill (operators.gapfill — the
    Timescale ``time_bucket_gapfill`` + ``locf`` shape). The bucket range
    is one broadcast row; the grid explode is shuffle-free; LOCF is one
    running window per key."""
    events = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    # 4dp average in SCALED-INTEGER space: value has <=4dp, so
    # sum(value*10^4) is an exact bigint and (2s+n) div (2n) is
    # round-half-up of s/n in pure integer arithmetic — engine-identical,
    # unlike ROUND(double_sum/count, 4), whose half-boundary cases
    # (x.xxxx5) flip between Spark and DuckDB (~2/1440 buckets at sf1).
    # Valid for value >= 0 (integral div truncation == floor there).
    avg_exact = F.expr(
        "CAST((2 * SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT))"
        " + COUNT(*)) DIV (2 * COUNT(*)) AS DOUBLE) / 10000.0"
    )
    filled = time_bucket_gapfill(
        events,
        ts_col="ts",
        width_seconds=GAPFILL_BUCKET_SECONDS,
        keys=["event_type"],
        value_agg=avg_exact,
        value_name="value_avg",
    )
    return filled.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "value_avg",
        "value_avg_filled",
        "gap_filled",
    )


@register(
    "event_volume_anomalies",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2),
    scored AS (
      SELECT event_type, day, n_events,
             SUM(n_events) OVER w AS s1,
             SUM(n_events * n_events) OVER w AS s2,
             COUNT(*) OVER w AS c
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n_events,
           ROUND(CAST(s1 AS DOUBLE) / c, 4) AS trailing_mean,
           ROUND((n_events - CAST(s1 AS DOUBLE) / c)
                 / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / c)
                        / (c - 1)), 4) AS zscore,
           abs((n_events - CAST(s1 AS DOUBLE) / c)
               / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / c)
                      / (c - 1))) >= 2.0 AS is_anomaly
    FROM scored
    WHERE c >= 3 AND CAST(s2 AS DOUBLE) * c > CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
    """,
)
def event_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing z-score anomaly detection on daily event volume: each
    (event_type, day)'s count scored against its own trailing-7-day
    mean/stddev (the self-exclusive ROWS frame). Variance comes from
    explicit sum / sum-of-squares window aggregates over exact integer
    counts — one shuffle on event_type, one sort, engine-portable
    arithmetic. Frames with <3 days or zero variance are not scored."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    n = F.col("n_events")
    scored = daily.select(
        "event_type",
        "day",
        "n_events",
        F.sum(n).over(w).alias("s1"),
        F.sum(n * n).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).alias("c"),
    )
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    c = F.col("c")
    mean = s1 / c
    sd = F.sqrt((s2 - s1 * s1 / c) / (c - F.lit(1)))
    z = (n - mean) / sd
    return scored.filter(
        (c >= 3) & (s2 * c > s1 * s1)
    ).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events",
        F.round(mean, 4).alias("trailing_mean"),
        F.round(z, 4).alias("zscore"),
        (F.abs(z) >= 2.0).alias("is_anomaly"),
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    pairs AS (
      SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type)
    SELECT prev_type, event_type, n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
    FROM pairs
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    lag per (user, time) gives adjacent pairs, counted and normalized per
    source state — the user-journey profile behind funnel design. One
    user_id-keyed sort for the lag, one pair-keyed agg, one tiny window
    over the 5x5 result."""
    events = table(spark, sf_dir, "events")
    seq_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "event_type",
            F.lag("event_type").over(seq_w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total_w = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(total_w), 6).alias("p"),
    )


@register(
    "rolling_7d_active_users",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    days AS (SELECT DISTINCT day FROM ud)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS active_users_7d
    FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling weekly-active-users: exact distinct users over each
    trailing 7-day window. The day grid (one row per distinct day) is
    broadcast into a range join against the deduped (user, day) set, so
    each user-day lands in <=7 windows — linear fan-out, no
    quadratic self-join, no giant collect_set window state. At extreme
    scale swap exact distinct for per-day HLL sketches merged across the
    window."""
    events = table(spark, sf_dir, "events")
    ud = events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    days = ud.select(F.col("day").alias("grid_day")).distinct()
    return (
        ud.join(
            F.broadcast(days),
            (F.col("day") <= F.col("grid_day"))
            & (F.col("day") >= F.date_sub(F.col("grid_day"), 6)),
        )
        .groupBy("grid_day")
        .agg(F.count_distinct("user_id").alias("active_users_7d"))
        .select(
            F.date_format("grid_day", "yyyy-MM-dd").alias("day"),
            "active_users_7d",
        )
    )


#: hour offset (2024-01-01 00:00 UTC = epoch hour 473352) — centering the
#: regressor keeps every exact-integer moment small.
_TREND_X0 = 473352


@register(
    "value_trend_by_type",
    oracle=f"""
    WITH pts AS (
      SELECT event_type,
             CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) - {_TREND_X0} AS x,
             CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS y4
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
    s AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y4) AS sy, SUM(x * y4) AS sxy, SUM(x * x) AS sxx
      FROM pts GROUP BY event_type)
    SELECT event_type,
           CAST(n AS BIGINT) AS n_events,
           CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                ELSE ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE)
                           * 24.0 / 10000.0, 6) END AS slope_per_day,
           ROUND(CAST(sy AS DOUBLE) / n / 10000.0, 6) AS avg_value
    FROM s
    """,
)
def value_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend (value vs event time) in ONE aggregation pass:
    the five moments (n, Σx, Σy, Σxy, Σx²) ride a single map-side-combined
    groupBy, then the closed-form slope is one expression — no second scan,
    no window, no collect. All moments are EXACT integers (hour-floored
    regressor, centered at 2024-01-01; value in 1e-4 fixed point, summed
    as decimal(38)/HUGEINT so sf-promotion can't overflow), so the only
    float ops are the final division and rounding — bit-identical across
    engines. The slope is reported per day."""
    ev = table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    x = (
        F.expr("CAST(unix_timestamp(ts) AS BIGINT) DIV 3600")
        - F.lit(_TREND_X0)
    ).alias("x")
    y4 = F.expr(
        "CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)"
    ).alias("y4")
    pts = ev.select("event_type", x, y4)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y4"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("y4"))).alias("sxy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den_exact = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "event_type",
        F.col("n").alias("n_events"),
        F.when(den_exact == 0, F.lit(0.0))
        .otherwise(
            F.round(num / den_exact.cast("double") * 24.0 / 10000.0, 6)
        )
        .alias("slope_per_day"),
        F.round(F.col("sy").cast("double") / F.col("n") / 10000.0, 6).alias(
            "avg_value"
        ),
    )


_Y4 = "CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)"


@register(
    "value_cusum_changepoint",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             SUM({_Y4}) AS sy
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2),
    w AS (
      SELECT event_type, day, sy,
             SUM(sy) OVER (PARTITION BY event_type ORDER BY day
                           ROWS UNBOUNDED PRECEDING) AS p,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS d_idx,
             SUM(sy) OVER (PARTITION BY event_type) AS stot,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM daily),
    c AS (SELECT event_type, day, n, n * p - d_idx * stot AS num FROM w),
    r AS (
      SELECT event_type, day, n, num,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY abs(num) DESC, day) AS rk
      FROM c)
    SELECT event_type, day AS changepoint_day,
           CAST(n AS BIGINT) AS n_days,
           ROUND(CAST(abs(num) AS DOUBLE) / n / 10000.0, 6) AS max_abs_cusum
    FROM r WHERE rk = 1
    """,
)
def value_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint estimate per event_type: the day where the
    cumulative deviation of daily value totals from the series mean peaks
    — the standard level-shift detector. The running statistic is kept
    EXACT by clearing denominators (num_d = n*P_d - d*S on fixed-point
    integer daily totals), so the argmax ordering has no float in it and
    ties break deterministically on day; the only float op is the final
    report division. Windows are partitioned per event_type (the per-key
    series sort parallelizes across keys; days-per-key is bounded, the
    100 TB growth axis is keys, not series length)."""
    ev = table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    daily = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.sum(F.expr(_Y4).cast("decimal(38,0)")).alias("sy"))
    wcum = Window.partitionBy("event_type").orderBy("day")
    wall = Window.partitionBy("event_type")
    c = daily.select(
        "event_type",
        "day",
        (
            F.count(F.lit(1)).over(wall) * F.sum("sy").over(wcum)
            - F.row_number().over(wcum) * F.sum("sy").over(wall)
        ).alias("num"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    r = c.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.abs(F.col("num")).desc(), F.col("day")
            )
        ),
    ).where(F.col("rk") == 1)
    return r.select(
        "event_type",
        F.col("day").alias("changepoint_day"),
        F.col("n").alias("n_days"),
        F.round(
            F.abs(F.col("num")).cast("double") / F.col("n") / F.lit(10000.0),
            6,
        ).alias("max_abs_cusum"),
    )


@register(
    "daily_autocorr_by_type",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             SUM({_Y4}) AS sy
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2),
    pairs AS (
      SELECT event_type, sy AS y,
             LAG(sy) OVER (PARTITION BY event_type ORDER BY day) AS x
      FROM daily),
    s AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(x) sx, SUM(y) sygm, SUM(x*x) sxx, SUM(y*y) syy, SUM(x*y) sxy
      FROM pairs WHERE x IS NOT NULL GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sygm * sygm = 0 THEN 0.0
                ELSE ROUND(CAST(n * sxy - sx * sygm AS DOUBLE)
                           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                  * CAST(n * syy - sygm * sygm AS DOUBLE)), 6)
           END AS autocorr_lag1
    FROM s
    """,
)
def daily_autocorr_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of daily value totals per event_type — the
    'is today predictive of tomorrow' seasonality screen. (y_{d-1}, y_d)
    pairs come from one LAG over the per-key day order; the correlation
    then reuses the exact-moment recipe (fixed-point totals, decimal(38)
    products so squares of 1e11-scale daily sums can't overflow, float
    only in the final divide/sqrt/round)."""
    ev = table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    daily = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.sum(F.expr(_Y4).cast("decimal(38,0)")).alias("sy"))
    pairs = daily.select(
        "event_type",
        F.col("sy").alias("y"),
        F.lag("sy").over(
            Window.partitionBy("event_type").orderBy("day")
        ).alias("x"),
    ).where(F.col("x").isNotNull())
    s = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sygm"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sygm") * F.col("sygm")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sygm")).cast(
        "double"
    )
    return s.select(
        "event_type",
        F.col("n").alias("n_pairs"),
        F.when((vx == 0) | (vy == 0), F.lit(0.0))
        .otherwise(
            F.round(
                num / F.sqrt(vx.cast("double") * vy.cast("double")), 6
            )
        )
        .alias("autocorr_lag1"),
    )


@register(
    "rolling_weekly_value_by_type",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day_idx,
             SUM({_Y4}) AS sy
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2),
    w AS (
      SELECT event_type, day_idx,
             SUM(sy) OVER (PARTITION BY event_type ORDER BY day_idx
                           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS ssum,
             COUNT(*) OVER (PARTITION BY event_type ORDER BY day_idx
                            RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS ndays
      FROM daily)
    SELECT event_type,
           strftime(to_timestamp(day_idx * 86400), '%Y-%m-%d') AS day,
           CAST(ndays AS BIGINT) AS n_days_in_window,
           ROUND(CAST(ssum AS DOUBLE) / ndays / 10000.0, 6) AS rolling_avg_daily_value
    FROM w
    """,
)
def rolling_weekly_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day moving average of daily value totals per event_type
    — the RANGE-frame window shape (value-based frame over the integer day
    index, so calendar gaps shrink the window rather than silently pulling
    in older rows like a ROWS frame would). Daily totals are exact
    fixed-point integers; the frame sum stays exact and only the final
    report divides. Partitioned per key: series sorts parallelize across
    keys."""
    ev = table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    daily = ev.groupBy(
        "event_type",
        F.expr("CAST(unix_timestamp(ts) AS BIGINT) DIV 86400").alias(
            "day_idx"
        ),
    ).agg(F.sum(F.expr(_Y4).cast("decimal(38,0)")).alias("sy"))
    frame = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rangeBetween(-6, 0)
    )
    w = daily.select(
        "event_type",
        "day_idx",
        F.sum("sy").over(frame).alias("ssum"),
        F.count(F.lit(1)).over(frame).alias("ndays"),
    )
    return w.select(
        "event_type",
        F.date_format(
            F.timestamp_seconds(F.col("day_idx") * 86400), "yyyy-MM-dd"
        ).alias("day"),
        F.col("ndays").alias("n_days_in_window"),
        F.round(
            F.col("ssum").cast("double") / F.col("ndays") / F.lit(10000.0), 6
        ).alias("rolling_avg_daily_value"),
    )


@register(
    "inter_event_gap_percentiles",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
             LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER (
               PARTITION BY user_id
               ORDER BY FLOOR(epoch(ts)), event_id) AS prev_sec
      FROM events WHERE ts IS NOT NULL),
    gaps AS (
      SELECT event_type, sec - prev_sec AS gap_s
      FROM seq WHERE prev_sec IS NOT NULL)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(quantile_cont(gap_s, 0.5), 4) AS p50_gap_s,
           ROUND(quantile_cont(gap_s, 0.9), 4) AS p90_gap_s,
           ROUND(quantile_cont(gap_s, 0.99), 4) AS p99_gap_s,
           MAX(gap_s) AS max_gap_s
    FROM gaps GROUP BY event_type
    """,
)
def inter_event_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-user inter-event gaps by event_type — the
    empirical input for choosing a streaming WATERMARK delay and a
    session timeout (p99 gap ~ the out-of-orderness bound you must
    tolerate). Gaps are exact integer seconds from a per-user LAG; the
    sequence orders by (floor-second, event_id) so the ordering is
    identical across engines even though the raw timestamps carry
    sub-second components that Spark and DuckDB store at different
    precisions. Exact percentiles over bounded per-group gap counts."""
    ev = table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    sec = F.expr("CAST(unix_timestamp(ts) AS BIGINT)")
    w = Window.partitionBy("user_id").orderBy(sec, F.col("event_id"))
    seq = ev.select(
        "event_type",
        sec.alias("sec"),
        F.lag(sec).over(w).alias("prev_sec"),
    )
    gaps = seq.where(F.col("prev_sec").isNotNull()).select(
        "event_type", (F.col("sec") - F.col("prev_sec")).alias("gap_s")
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.percentile("gap_s", F.lit(0.5)), 4).alias("p50_gap_s"),
        F.round(F.percentile("gap_s", F.lit(0.9)), 4).alias("p90_gap_s"),
        F.round(F.percentile("gap_s", F.lit(0.99)), 4).alias("p99_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )
