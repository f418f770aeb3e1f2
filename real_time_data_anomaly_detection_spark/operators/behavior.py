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

from pyspark.sql import DataFrame, SparkSession, Window
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
    ev = events.select(user_col, type_col, ts_col).filter(
        F.col(type_col).isin(list(stages))
    )
    # Stage-k conversion time t_k = min ts of a stage-k event STRICTLY
    # AFTER t_{k-1} — a per-user recurrence. One user-keyed exchange
    # feeds a chain of same-partition window mins (each conditions on
    # the previous window column), instead of re-inlining stage k-1's
    # whole frontier subtree into every later stage (which cost one
    # events scan + join PER (i, j<=i) pair — 6 scans for 3 stages).
    w = Window.partitionBy(user_col)
    cur = ev
    tcols: list[str] = []
    for i, stage in enumerate(stages):
        qual = F.col(type_col) == stage
        if tcols:
            qual = qual & (F.col(ts_col) > F.col(tcols[-1]))
        t = f"_t{i + 1}"
        cur = cur.withColumn(t, F.min(F.when(qual, F.col(ts_col))).over(w))
        tcols.append(t)
    # Every row of a user carries identical _t* values; the user-keyed
    # reduce reuses the window's hash partitioning (no new exchange),
    # and ONE global aggregation yields every stage count (count(_tk)
    # skips nulls = users that never reached stage k).
    per_user = cur.groupBy(user_col).agg(
        *[F.max(t).alias(t) for t in tcols]
    )
    totals = per_user.agg(
        *[F.count(t).alias(f"_n{i + 1}") for i, t in enumerate(tcols)]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage_ord"),
                F.lit(stage).alias("stage"),
                F.col(f"_n{i + 1}").alias("n_users"),
            )
            for i, stage in enumerate(stages)
        ]
    )
    return (
        totals.select(F.explode(rows).alias("_r"))
        .select("_r.stage_ord", "_r.stage", "_r.n_users")
        .orderBy("stage_ord")
    )


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


def _epoch_s_tzfree(ts_col: str):
    """Whole epoch seconds built TZ-FREE from date/time fields (the
    io.load_table / q_regression pattern: unix_timestamp() on a
    TIMESTAMP_NTZ re-interprets in the session time zone)."""
    return (
        F.datediff(F.to_date(ts_col), F.lit("1970-01-01").cast("date")).cast(
            "bigint"
        )
        * 86400
        + F.hour(ts_col) * 3600
        + F.minute(ts_col) * 60
        + F.second(ts_col)
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization: per-user session ids assigned where
    the inter-event gap exceeds ``gap``, one row per session with
    (user, session_id, session_start, n_events, duration_s).

    The classic two-window formulation — lag → new-session flag →
    running sum — then a grouped rollup. All three window passes and
    the final groupBy cluster on ``user_col``, so the whole operator
    costs ONE user-keyed exchange at scale (Catalyst reuses the sort
    order across the two frames and the partial-aggregated rollup).
    Unlike the fixed/session time-window operators
    (relational.q_session_window_batch), the gap rule here is applied
    over an explicit total order with a deterministic tiebreak, which
    is what makes it exactly replayable cross-engine.

    The gap test uses native interval arithmetic on the NTZ
    timestamps (microsecond-exact in both engines); durations are
    whole-second, built tz-free."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lagged = F.lag(ts_col).over(w)
    new_s = (
        lagged.isNull()
        | (F.col(ts_col) - lagged > F.expr(f"INTERVAL '{gap}'"))
    ).cast("int")
    sid = F.sum(new_s).over(w_run)
    sess = events.select(
        F.col(user_col), F.col(ts_col), F.col(tiebreak_col)
    ).withColumn("session_id", sid)
    ep = _epoch_s_tzfree(ts_col)
    return (
        sess.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            (F.max(ep) - F.min(ep)).alias("duration_s"),
        )
        .orderBy(user_col, "session_id")
    )


@query(
    "q_sessionize",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL '6 hours'
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
            SELECT user_id, ts,
                   sum(new_s) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged)
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               min(ts) AS session_start,
               count(*) AS n_events,
               CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT)
                   AS duration_s
        FROM sess GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions over the event stream: per (user, session)
    start time, event count, and whole-second duration — the standard
    product-analytics sessionization, one user-keyed exchange
    end-to-end. The declared gap is 6 hours (not the operator's
    30-minute default) because at the fixture's event density
    (~2 events/user/day) a 30-minute rule yields 95% singleton
    sessions — 6 h gives ~1.75 events/session, so the flag → running
    sum → rollup algebra is genuinely exercised, not vacuously
    passed. Oracle replays the identical chain."""
    ev = load_table(spark, sf_dir, "events")
    return sessionize(ev, gap="6 hours")


@query(
    "q_markov_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events),
        pairs AS (
            SELECT prev_type, event_type AS next_type, count(*) AS n
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY 1, 2)
        SELECT prev_type, next_type, n,
               ((20000 * n + sum(n) OVER (PARTITION BY prev_type))
                // (2 * sum(n) OVER (PARTITION BY prev_type)))
               / 10000.0 AS p
        FROM pairs ORDER BY prev_type, next_type
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix over per-user event
    sequences: (prev_type, next_type, n, p) with p row-normalized per
    prev_type — the classic Markov-chain summary behind next-event
    prediction and funnel-drop diagnosis. One user-keyed window pass
    for the lag, then the aggregate and the normalizing window both
    run on the TYPE-PAIR relation (|types|² rows — tiny at any corpus
    scale, so the only event-sized exchange is the lag's). The 4-dp
    probability is rounded in INTEGER arithmetic — half-up via
    (20000·n + N) div (2N) — because round(double, 4) is NOT portable
    on half-boundary doubles (the _exact_mean_4dp lesson); dividing
    the engine-identical integer by 10000.0 then yields the identical
    IEEE double on both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    norm = Window.partitionBy("prev_type")
    tot = F.sum("n").over(norm)
    num = F.lit(20000) * F.col("n") + tot
    den = F.lit(2) * tot
    # exact bigint div: subtract the remainder first, so the double
    # division is of exactly-divisible ints (quotient <= 10000)
    p4 = ((num - F.pmod(num, den)) / den).cast("bigint")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        (p4 / F.lit(10000.0)).alias("p"),
    ).orderBy("prev_type", "next_type")


@query(
    "q_rfm",
    oracle="""
        WITH base AS (
            SELECT o_custkey AS custkey,
                   date_diff('day', CAST(max(o_orderdate) AS DATE),
                             DATE '2001-09-01') AS recency_days,
                   count(*) AS frequency,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS monetary_cents
            FROM orders GROUP BY 1)
        SELECT custkey, recency_days, frequency,
               CAST(monetary_cents AS DOUBLE) / 100 AS monetary,
               ntile(5) OVER (ORDER BY recency_days ASC, custkey) AS r_score,
               ntile(5) OVER (ORDER BY frequency DESC, custkey) AS f_score,
               ntile(5) OVER (ORDER BY monetary_cents DESC, custkey) AS m_score
        FROM base ORDER BY custkey
    """,
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over the orders fact: per customer,
    recency (days from last order to a fixed anchor), frequency
    (order count), monetary (lifetime spend), each quintile-scored
    with ntile(5) — the classic CRM segmentation, one custkey-keyed
    aggregate plus three window passes over the CUSTOMER-sized rollup
    (never the order-sized fact). Determinism discipline: monetary
    sums exact integer cents (cf. q_ewma), every ntile orders by an
    integer metric with custkey as tiebreak, and recency is an
    integer date difference — no engine-dependent double appears
    before the final exact division.

    Scale note: a global ntile forces the customer rollup through ONE
    window partition — fine for dimension-sized rollups (TPC-H
    customers ~ 15M rows/TB of fact data); for larger populations
    swap in percent_rank bucketing over a range-partitioned sort,
    which keeps the ordering distributed."""
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit("2001-09-01").cast("date"), F.to_date(F.max("o_orderdate"))
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(
            F.round(F.col("o_totalprice") * F.lit(100.0), 0).cast("bigint")
        ).alias("monetary_cents"),
    )
    w_r = Window.orderBy(F.asc("recency_days"), "custkey")
    w_f = Window.orderBy(F.desc("frequency"), "custkey")
    w_m = Window.orderBy(F.desc("monetary_cents"), "custkey")
    return base.select(
        "custkey",
        "recency_days",
        "frequency",
        (F.col("monetary_cents").cast("double") / F.lit(100.0)).alias("monetary"),
        F.ntile(5).over(w_r).alias("r_score"),
        F.ntile(5).over(w_f).alias("f_score"),
        F.ntile(5).over(w_m).alias("m_score"),
    ).orderBy("custkey")


@query(
    "q_basket_pairs",
    oracle="""
        WITH b AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        nb AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
        item AS (
            SELECT l_partkey, count(*) AS c FROM b GROUP BY 1),
        pairs AS (
            SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS support
            FROM b x JOIN b y
              ON x.l_orderkey = y.l_orderkey
             AND x.l_partkey < y.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2)
        SELECT p.a, p.b, p.support,
               (p.support * nb.n_orders * 1000000) // (ia.c * ib.c)
                   AS lift_ppm
        FROM pairs p
        JOIN item ia ON ia.l_partkey = p.a
        JOIN item ib ON ib.l_partkey = p.b
        CROSS JOIN nb
        ORDER BY p.support DESC, p.a, p.b
    """,
)
def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining over order baskets: co-purchased part
    pairs with support >= 2 and integer-ppm lift — the association-
    rules support/lift primitive. Pairs are generated BASKET-LOCALLY
    (collect the order's sorted distinct parts, explode i<j index
    pairs inside codegen) instead of a basket self-join, so per-order
    fan-out is bounded by basket size squared (TPC-H baskets <= 7
    items -> <= 21 pairs) and the only exchanges are the basket
    groupBy and the pair-count aggregate; the per-item counts rejoin
    BROADCAST (dimension-sized). Lift is published in exact integer
    parts-per-million — (support·N·1e6) div (c_a·c_b) — so no
    engine-dependent double exists anywhere (cf. q_ewma)."""
    b = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    baskets = b.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("_items")
    )
    idx_pairs = F.expr(
        """flatten(transform(sequence(0, size(_items) - 2), i ->
               transform(sequence(i + 1, size(_items) - 1), j ->
                   struct(_items[i] AS a, _items[j] AS b))))"""
    )
    pairs = (
        baskets.filter(F.size("_items") >= 2)
        .select(F.explode(idx_pairs).alias("_p"))
        .groupBy(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )
    item = b.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    n_orders = baskets.count()
    ia = F.broadcast(item.select(F.col("_pk").alias("_pka"), F.col("_c").alias("_ca")))
    ib = F.broadcast(item.select(F.col("_pk").alias("_pkb"), F.col("_c").alias("_cb")))
    return (
        pairs.join(ia, pairs.a == F.col("_pka"))
        .join(ib, pairs.b == F.col("_pkb"))
        .select(
            "a",
            "b",
            "support",
            F.expr(f"(support * {n_orders}L * 1000000L) div (_ca * _cb)").alias(
                "lift_ppm"
            ),
        )
        .orderBy(F.desc("support"), "a", "b")
    )


@query(
    "q_funnel_time",
    oracle="""
        WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                    WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
               JOIN s1 ON e.user_id = s1.user_id
               WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
        s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
               JOIN s2 ON e.user_id = s2.user_id
               WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
        d12 AS (SELECT floor(epoch(s2.t)) - floor(epoch(s1.t)) AS ds
                FROM s2 JOIN s1 USING (user_id)),
        d23 AS (SELECT floor(epoch(s3.t)) - floor(epoch(s2.t)) AS ds
                FROM s3 JOIN s2 USING (user_id))
        SELECT * FROM (
            SELECT 'view->click' AS stage_pair, count(*) AS n_users,
                   round(quantile_cont(ds, 0.5), 4) AS median_s,
                   round(quantile_cont(ds, 0.9), 4) AS p90_s
            FROM d12
            UNION ALL
            SELECT 'click->purchase', count(*),
                   round(quantile_cont(ds, 0.5), 4),
                   round(quantile_cont(ds, 0.9), 4)
            FROM d23)
        ORDER BY stage_pair
    """,
)
def q_funnel_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-stage conversion latency for the view→click→purchase
    funnel: per stage pair, converting-user count plus median and p90
    seconds between the stages' first-touch conversion times — the
    companion to q_funnel's counts (how MANY convert vs how FAST).
    Stage frontiers are the same user-keyed min-aggregates as
    funnel(); the percentile inputs are whole-second integer diffs
    (tz-free, cf. q_regression), so the quantile interpolation runs
    on engine-identical integer multisets and the rounded output is
    deterministic. All aggregates are user-rollup-sized — events are
    touched only by the three stage scans."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .filter(F.col("event_type").isin(["view", "click", "purchase"]))
    )
    ep = _epoch_s_tzfree("ts")
    # Same chained-window recurrence as funnel() — the join-per-stage
    # form consumed s1/s2 twice each (next frontier + the diff
    # relation), re-inlining 8 events scans / 9 exchanges. The epoch
    # min rides each stage's qualifying set alongside the ts min
    # (floor-epoch is non-decreasing in ts, so min commutes with it,
    # exactly as the separate F.min(ep)/F.min(ts) pair did).
    w = Window.partitionBy("user_id")
    q1 = F.col("event_type") == "view"
    cur = ev.withColumn("_ts1", F.min(F.when(q1, F.col("ts"))).over(w)).withColumn(
        "_t1", F.min(F.when(q1, ep)).over(w)
    )
    q2 = (F.col("event_type") == "click") & (F.col("ts") > F.col("_ts1"))
    cur = cur.withColumn("_ts2", F.min(F.when(q2, F.col("ts"))).over(w)).withColumn(
        "_t2", F.min(F.when(q2, ep)).over(w)
    )
    q3 = (F.col("event_type") == "purchase") & (F.col("ts") > F.col("_ts2"))
    cur = cur.withColumn("_t3", F.min(F.when(q3, ep)).over(w))
    per_user = cur.groupBy("user_id").agg(
        F.max("_t1").alias("_t1"),
        F.max("_t2").alias("_t2"),
        F.max("_t3").alias("_t3"),
    )
    # ds12 is non-null exactly for s2's users, ds23 for s3's (each
    # stage implies the previous), so count/percentile over the
    # null-skipping aggregates reproduce the two join relations — and
    # ONE aggregation computes both stage pairs (two consumers of
    # per_user would re-inline the window chain).
    totals = per_user.select(
        (F.col("_t2") - F.col("_t1")).alias("_ds12"),
        (F.col("_t3") - F.col("_t2")).alias("_ds23"),
    ).agg(
        F.count("_ds12").alias("_n12"),
        F.round(F.expr("percentile(_ds12, 0.5)"), 4).alias("_m12"),
        F.round(F.expr("percentile(_ds12, 0.9)"), 4).alias("_p12"),
        F.count("_ds23").alias("_n23"),
        F.round(F.expr("percentile(_ds23, 0.5)"), 4).alias("_m23"),
        F.round(F.expr("percentile(_ds23, 0.9)"), 4).alias("_p23"),
    )
    rows = F.array(
        F.struct(
            F.lit("view->click").alias("stage_pair"),
            F.col("_n12").alias("n_users"),
            F.col("_m12").alias("median_s"),
            F.col("_p12").alias("p90_s"),
        ),
        F.struct(
            F.lit("click->purchase").alias("stage_pair"),
            F.col("_n23").alias("n_users"),
            F.col("_m23").alias("median_s"),
            F.col("_p23").alias("p90_s"),
        ),
    )
    return (
        totals.select(F.explode(rows).alias("_r"))
        .select("_r.stage_pair", "_r.n_users", "_r.median_s", "_r.p90_s")
        .orderBy("stage_pair")
    )


@query(
    "q_cohort_ltv",
    oracle="""
        WITH cohort AS (
            SELECT user_id,
                   CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
            FROM events WHERE event_type = 'signup' GROUP BY 1),
        buys AS (
            SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
                   CAST(round(value * 1000000) AS BIGINT) AS v_micro
            FROM events WHERE event_type = 'purchase'),
        weekly AS (
            SELECT c.cohort_week,
                   CAST(floor(date_diff('day', c.cohort_week, b.wk) / 7.0)
                        AS INT) AS week_n,
                   count(DISTINCT b.user_id) AS n_buyers,
                   sum(b.v_micro) AS spend_micro
            FROM buys b JOIN cohort c USING (user_id)
            WHERE b.wk >= c.cohort_week
            GROUP BY 1, 2)
        SELECT cohort_week, week_n, n_buyers,
               CAST(spend_micro AS DOUBLE) / 1000000 AS spend,
               CAST(sum(spend_micro) OVER (PARTITION BY cohort_week
                                           ORDER BY week_n
                                           ROWS UNBOUNDED PRECEDING)
                    AS DOUBLE) / 1000000 AS cum_spend
        FROM weekly ORDER BY cohort_week, week_n
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: per signup-cohort week, weekly
    purchase spend and its running cumulative — the revenue companion
    to q_retention's activity counts. Spend is summed and accumulated
    in exact integer micro-units (order-independent BIGINT arithmetic,
    cf. q_ewma), converted by one exact division at publication; the
    running window orders by the integer week index, so every value is
    engine-identical. Aggregates are cohort-week-sized — the events
    fact is touched by two filtered scans."""
    ev = load_table(spark, sf_dir, "events")
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week"))
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.date_trunc("week", F.col("ts")).cast("date").alias("_wk"),
        _ltv_micro(F.col("value")).alias("_v"),
    )
    weekly = (
        buys.join(cohort, "user_id")
        .filter(F.col("_wk") >= F.col("cohort_week"))
        .groupBy(
            "cohort_week",
            (F.datediff("_wk", "cohort_week") / 7).cast("int").alias("week_n"),
        )
        .agg(
            F.countDistinct("user_id").alias("n_buyers"),
            F.sum("_v").alias("_spend_micro"),
        )
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_n")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return weekly.select(
        "cohort_week",
        "week_n",
        "n_buyers",
        (F.col("_spend_micro").cast("double") / F.lit(1000000.0)).alias("spend"),
        (
            F.sum("_spend_micro").over(w).cast("double") / F.lit(1000000.0)
        ).alias("cum_spend"),
    ).orderBy("cohort_week", "week_n")


def _ltv_micro(col):
    """Exact integer micro-units of a monetary double (cf.
    timeseries._micro_units — duplicated locally to keep behavior.py
    import-independent of the timeseries module)."""
    return F.round(col * F.lit(1000000.0), 0).cast("bigint")
