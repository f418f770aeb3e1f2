"""Event-sequence analytics over the events table: funnel
conversion, cohort retention, per-group OLS trend — the classic
product-analytics trio, expressed as plain aggregation/join plans so
Catalyst keeps them shuffle-minimal and every one is oracle-backed.

Scale shape: everything keys on user_id or event_type. Funnel and
retention shuffle (user, stage/week) aggregates — rows per user-week,
not per event, after the first partial aggregation; on a cluster the
three funnel stages reuse one user_id partitioning. The regression is
a single partial-aggregated scan (regr_* are algebraic aggregates:
constant-size state per group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.io import load_table
from real_time_data_anomaly_detection_spark.operators.registry import query


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel user counts: a user converts to stage k iff
    their earliest stage-k event is STRICTLY AFTER their conversion
    time for stage k-1 (first-touch semantics). Returns
    (stage_ord, stage, n_users)."""
    ev = events.select(user_col, type_col, ts_col)
    frontier = None
    counts = []
    for i, stage in enumerate(stages):
        at_stage = ev.filter(F.col(type_col) == stage)
        if frontier is not None:
            at_stage = at_stage.join(frontier, user_col).filter(
                F.col(ts_col) > F.col("_t_prev")
            )
        frontier = at_stage.groupBy(user_col).agg(
            F.min(ts_col).alias("_t_prev")
        )
        counts.append(
            frontier.agg(
                F.lit(i + 1).alias("stage_ord"),
                F.lit(stage).alias("stage"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.orderBy("stage_ord")


@query(
    "q_funnel",
    oracle="""
        WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                    WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
               JOIN s1 ON e.user_id = s1.user_id
               WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
        s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
               JOIN s2 ON e.user_id = s2.user_id
               WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
        SELECT * FROM (
            SELECT 1 AS stage_ord, 'view' AS stage, count(*) AS n_users FROM s1
            UNION ALL
            SELECT 2, 'click', count(*) FROM s2
            UNION ALL
            SELECT 3, 'purchase', count(*) FROM s3)
        ORDER BY stage_ord
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase conversion funnel with first-touch
    ordering semantics (each stage's clock starts at the previous
    stage's earliest qualifying event)."""
    ev = load_table(spark, sf_dir, "events")
    return funnel(ev, ["view", "click", "purchase"])


def retention_cohorts(
    events: DataFrame,
    signup_type: str = "signup",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: cohort = ISO week of the user's
    first ``signup_type`` event; a user counts as retained in week k
    if they have ANY event in cohort_week + k. Returns
    (cohort_week, week_n, n_users)."""
    cohort = (
        events.filter(F.col(type_col) == signup_type)
        .groupBy(user_col)
        .agg(F.date_trunc("week", F.min(ts_col)).cast("date").alias("cohort_week"))
    )
    activity = events.select(
        user_col, F.date_trunc("week", F.col(ts_col)).cast("date").alias("_week")
    ).distinct()
    return (
        activity.join(cohort, user_col)
        .filter(F.col("_week") >= F.col("cohort_week"))
        .select(
            "cohort_week",
            (F.datediff("_week", "cohort_week") / 7).cast("int").alias("week_n"),
            user_col,
        )
        .groupBy("cohort_week", "week_n")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_n")
    )


@query(
    "q_retention",
    oracle="""
        WITH cohort AS (
            SELECT user_id,
                   CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
            FROM events WHERE event_type = 'signup' GROUP BY 1),
        activity AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS wk
            FROM events)
        SELECT cohort_week,
               CAST(floor(date_diff('day', cohort_week, wk) / 7.0) AS INT)
                   AS week_n,
               count(*) AS n_users
        FROM activity JOIN cohort USING (user_id)
        WHERE wk >= cohort_week
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly signup-cohort retention counts. distinct(user, week)
    first — the aggregate sees user-weeks, never raw events."""
    return retention_cohorts(load_table(spark, sf_dir, "events"))


@query(
    "q_regression",
    oracle="""
        SELECT event_type,
               round(regr_slope(value, floor(epoch(ts)) / 86400.0), 4) AS slope_per_day,
               round(regr_intercept(value, floor(epoch(ts)) / 86400.0), 4) AS intercept,
               round(regr_r2(value, floor(epoch(ts)) / 86400.0), 4) AS r2,
               count(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def q_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of value over time (slope per day,
    intercept, R²) via the algebraic regr_* aggregates — constant
    state per group, one partial-aggregated scan.

    x is whole epoch seconds built TZ-FREE from date/time fields
    (events.ts is TIMESTAMP_NTZ; unix_timestamp() on NTZ re-interprets
    in the SESSION time zone, which would shift the intercept under a
    non-UTC driver — the same hazard io.load_table documents)."""
    ev = load_table(spark, sf_dir, "events")
    epoch_s = (
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).cast("bigint")
        * 86400
        + F.hour("ts") * 3600
        + F.minute("ts") * 60
        + F.second("ts")
    )
    x = (epoch_s / F.lit(86400.0)).alias("x")
    d = ev.select("event_type", F.col("value").alias("y"), x)
    return (
        d.groupBy("event_type")
        .agg(
            F.round(F.regr_slope("y", "x"), 4).alias("slope_per_day"),
            F.round(F.regr_intercept("y", "x"), 4).alias("intercept"),
            F.round(F.regr_r2("y", "x"), 4).alias("r2"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )
