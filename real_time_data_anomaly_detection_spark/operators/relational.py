"""Batch relational operator surface (SURVEY.md §2.2).

Every query here is declarative DataFrame API — Catalyst handles
predicate pushdown, column pruning, join selection, and whole-stage
codegen. Each carries a DuckDB oracle twin with identical column
aliases and round(…, 4) on computed doubles (fp summation order differs
between engines).

Reference parity notes (file:line into /root/reference):
- equality filter ~ app/app3_ML.py:111 (pandas boolean mask)
- null-drop      ~ app/app3_ML.py:117 (dropna)
- projection     ~ app/app3_ML.py:116
- CASE WHEN      ~ producer/producer-3.py:91-110 (per-type columns)
- clamp-at-zero  ~ producer/producer-3.py:128-130
- last-K tail    ~ app/app3_ML.py:177-180 (deque tail cap)
Everything else (joins, aggs, windows, set ops) is new surface the
reference lacks entirely (SURVEY.md §2.1: "no joins, no aggregations").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.io import load_table
from real_time_data_anomaly_detection_spark.operators.registry import query


def _r(col, n: int = 4):
    """round(cast(col as double), n) — the oracle-parity rounding rule."""
    return F.round(col.cast("double"), n)


# ---------------------------------------------------------------------------
# Scan + projection
# ---------------------------------------------------------------------------


@query(
    "q_scan_project",
    oracle="SELECT event_id, event_type, value FROM events",
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan with column pruning: ReadSchema should list 3 cols."""
    return load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")


@query(
    "q_project_compute",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1 - l_discount), 4) AS revenue
        FROM lineitem
    """,
)
def q_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic projection (whole-stage codegen'd expression)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _r(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@query(
    "q_case_when",
    oracle="""
        SELECT event_id,
               CASE WHEN value < 50 THEN 'low'
                    WHEN value < 200 THEN 'mid'
                    ELSE 'high' END AS tier
        FROM events
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing (analog of producer per-type conditionals,
    reference producer/producer-3.py:91-110)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 200, "mid")
        .otherwise("high")
        .alias("tier"),
    )


@query(
    "q_clamp",
    oracle="""
        SELECT event_id, round(greatest(value - 100, 0), 4) AS clamped
        FROM events
    """,
)
def q_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamp-at-zero (reference producer/producer-3.py:128-130)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", _r(F.greatest(F.col("value") - 100, F.lit(0.0))).alias("clamped")
    )


# ---------------------------------------------------------------------------
# Filters
# ---------------------------------------------------------------------------


@query(
    "q_filter_eq",
    oracle="SELECT event_id, user_id, value FROM events WHERE event_type = 'error'",
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality predicate, pushed to the parquet scan (reference analog:
    pandas mask, app/app3_ML.py:111)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "value")


@query(
    "q_filter_range",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 20 AND l_discount > 0.02
    """,
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range + AND predicate (PushedFilters: GreaterThanOrEqual, ...)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20) & (F.col("l_discount") > 0.02)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@query(
    "q_filter_null",
    oracle="SELECT event_id, props FROM events WHERE props IS NOT NULL",
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling filter (reference dropna, app/app3_ML.py:117)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.na.drop(subset=["props"]).select("event_id", "props")


@query(
    "q_filter_in",
    oracle="""
        SELECT event_id, event_type FROM events
        WHERE event_type IN ('click', 'view')
    """,
)
def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").isin("click", "view")).select(
        "event_id", "event_type"
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "q_join_inner",
    oracle="""
        SELECT o_orderkey, c_custkey, c_name, round(o_totalprice, 4) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join; AQE picks broadcast vs SMJ from runtime stats."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name", _r(F.col("o_totalprice")).alias("total")
    )


@query(
    "q_join_broadcast",
    oracle="""
        SELECT n_nationkey, n_name, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the 5-row region dim — no shuffle at any SF."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@query(
    "q_join_left",
    oracle="""
        SELECT c_custkey, o_orderkey,
               round(coalesce(o_totalprice, 0), 4) AS total
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers without orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        "o_orderkey",
        _r(F.coalesce(F.col("o_totalprice"), F.lit(0.0))).alias("total"),
    )


@query(
    "q_join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join ≡ WHERE EXISTS."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join ≡ WHERE NOT EXISTS."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_3way",
    oracle="""
        SELECT l_orderkey, l_linenumber, c_custkey,
               round(l_extendedprice * (1 - l_discount), 4) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'F'
    """,
)
def q_join_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join with a pushed filter; Catalyst reorders/AQE replans."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            "c_custkey",
            _r(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@query(
    "q_join_theta",
    oracle="""
        SELECT p_partkey, s_suppkey FROM part JOIN supplier ON p_size > s_suppkey
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join → broadcast nested-loop; only sane when one
    side is broadcastable (supplier is a dim)."""
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    return p.join(F.broadcast(s), p.p_size > s.s_suppkey).select(
        "p_partkey", "s_suppkey"
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@query(
    "q_agg_group",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4)                                 AS sum_qty,
               round(sum(l_extendedprice), 4)                            AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4)         AS sum_disc_price,
               round(avg(l_quantity), 4)                                 AS avg_qty,
               round(avg(l_discount), 4)                                 AS avg_disc,
               count(*)                                                  AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: hash aggregate with partial (map-side) combine."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity")).alias("sum_qty"),
            _r(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_disc_price"
            ),
            _r(F.avg("l_quantity")).alias("avg_qty"),
            _r(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_agg_global",
    oracle="""
        SELECT count(*) AS n_rows, round(sum(value), 4) AS sum_value,
               min(ts) AS min_ts, max(ts) AS max_ts
        FROM events
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (grouping-key-free) aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        _r(F.sum("value")).alias("sum_value"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


@query(
    "q_agg_distinct",
    oracle="""
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — expands to a two-phase aggregate in Spark."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_users"))


@query(
    "q_agg_rollup",
    oracle="""
        SELECT event_type, count(*) AS n
        FROM events GROUP BY ROLLUP (event_type)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: per-type counts + grand-total row (event_type NULL)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.rollup("event_type").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_agg_cube",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "q_agg_having",
    oracle="""
        SELECT o_orderpriority, count(*) AS n
        FROM orders GROUP BY o_orderpriority HAVING count(*) > 100
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 100)
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "q_window_rank",
    oracle="""
        SELECT event_id, event_type,
               row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
               rank()       OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rnk
        FROM events
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window functions with a total order (unique event_id)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
    )


@query(
    "q_window_lag",
    oracle="""
        SELECT event_id, user_id,
               round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4)
                 AS delta
        FROM events
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic — per-user value delta over event time."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        _r(F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "q_window_running",
    oracle="""
        SELECT event_id, event_type,
               round(sum(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum
        FROM events
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-sum frame — the batch analog of the reference's sliding
    accumulation (app/app3_ML.py:39-45)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id", "event_type", _r(F.sum("value").over(w)).alias("running_sum")
    )


@query(
    "q_window_lastk",
    oracle="""
        SELECT event_id, event_type, ts FROM (
            SELECT event_id, event_type, ts,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn <= 100
    """,
)
def q_window_lastk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newest 100 rows per group — exact semantics of the reference's
    outlier tail cap (app/app3_ML.py:177-180) done distributed."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .select("event_id", "event_type", "ts")
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k
# ---------------------------------------------------------------------------


@query(
    "q_topk",
    oracle="""
        SELECT event_id, value FROM events
        ORDER BY value DESC, event_id ASC LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans TakeOrderedAndProject (no full sort)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.orderBy(F.desc("value"), F.asc("event_id")).limit(10).select(
        "event_id", "value"
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "q_union_all",
    oracle="""
        SELECT c_name AS name FROM customer
        UNION ALL
        SELECT s_name AS name FROM supplier
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics, no dedup shuffle)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_name").alias("name"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_name").alias("name"))
    return c.unionByName(s)


@query(
    "q_intersect",
    oracle="""
        SELECT n_nationkey AS k FROM nation
        INTERSECT
        SELECT c_nationkey AS k FROM customer
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics on both engines)."""
    n = load_table(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("k"))
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    return n.intersect(c)


@query(
    "q_except",
    oracle="""
        SELECT n_nationkey AS k FROM nation
        EXCEPT
        SELECT s_nationkey AS k FROM supplier
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics)."""
    n = load_table(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return n.subtract(s)


# ---------------------------------------------------------------------------
# Scalar function surface
# ---------------------------------------------------------------------------


@query(
    "q_string_funcs",
    oracle="""
        SELECT p_partkey,
               upper(p_name)                  AS name_upper,
               substr(p_name, 1, 5)           AS name_pfx,
               length(p_name)                 AS name_len,
               concat(p_brand, ':', p_type)   AS brand_type,
               trim(p_name)                   AS name_trim,
               replace(p_name, 'a', '@')      AS name_repl
        FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions (upper/substr/length/concat/trim/replace)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim("p_name").alias("name_trim"),
        F.replace(F.col("p_name"), F.lit("a"), F.lit("@")).alias("name_repl"),
    )


@query(
    "q_date_funcs",
    oracle="""
        SELECT event_id,
               date_trunc('hour', ts) AS ts_hour,
               year(ts)  AS y,
               month(ts) AS mo,
               day(ts)   AS d,
               hour(ts)  AS h
        FROM events
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar functions (reference analog: to_timestamp cast,
    app/app3_ML.py:93)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        # hour-truncate via epoch arithmetic: date_trunc() would cast
        # TIMESTAMP_NTZ to session-tz TIMESTAMP and shift under non-UTC
        # driver sessions.
        F.expr(
            "timestampadd(HOUR,"
            " timestampdiff(HOUR, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts),"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ).alias("ts_hour"),
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
    )


@query(
    "q_math_funcs",
    oracle="""
        SELECT event_id,
               round(abs(value - 100), 4)      AS abs_v,
               CAST(floor(value) AS BIGINT)    AS floor_v,
               CAST(ceil(value) AS BIGINT)     AS ceil_v,
               round(pow(value, 2), 4)         AS pow_v,
               round(sqrt(abs(value)), 4)      AS sqrt_v
        FROM events
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar functions (abs/floor/ceil/pow/sqrt)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        _r(F.abs(F.col("value") - 100)).alias("abs_v"),
        F.floor("value").alias("floor_v"),
        F.ceil("value").alias("ceil_v"),
        _r(F.pow("value", F.lit(2))).alias("pow_v"),
        _r(F.sqrt(F.abs(F.col("value")))).alias("sqrt_v"),
    )


@query(
    "q_like_filter",
    oracle="""
        SELECT p_partkey, p_name FROM part
        WHERE p_name LIKE '%a%' AND p_name NOT LIKE 'b%'
          AND p_brand LIKE 'Brand#1_'
    """,
)
def q_like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE pattern predicates (contains / prefix-negation / single-char
    wildcard) — pushed to the scan as StringContains/StartsWith."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%a%")
        & ~F.col("p_name").like("b%")
        & F.col("p_brand").like("Brand#1_")
    ).select("p_partkey", "p_name")


@query(
    "q_in_subquery",
    oracle="""
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    """,
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) — planned as a left-semi join by Catalyst."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_in")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer_in")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey FROM v_orders_in
        WHERE o_custkey IN (SELECT c_custkey FROM v_customer_in WHERE c_acctbal > 5000)
        """
    )


@query(
    "q_union_distinct",
    oracle="""
        SELECT c_nationkey AS k FROM customer
        UNION
        SELECT s_nationkey AS k FROM supplier
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct semantics) — union + dedup shuffle, vs the
    shuffle-free UNION ALL of q_union_all."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.unionByName(s).distinct()


@query(
    "q_date_arith",
    oracle="""
        SELECT o_orderkey,
               date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
               o_orderdate + INTERVAL 30 DAY                         AS due_date,
               round(date_diff('month', TIMESTAMP '1995-01-01', o_orderdate), 4)
                                                                     AS months_since
        FROM orders
    """,
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: day diffs, interval addition, month diffs.

    DuckDB date_diff('month') counts month-boundary crossings; Spark's
    months_between is fractional, so the Spark side counts boundaries
    explicitly ((y2-y1)*12 + (m2-m1)) for identical semantics."""
    o = load_table(spark, sf_dir, "orders")
    epoch = F.lit("1995-01-01").cast("timestamp")
    months = (F.year("o_orderdate") - F.year(epoch)) * 12 + (
        F.month("o_orderdate") - F.month(epoch)
    )
    return o.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), epoch).cast("bigint").alias("days_since"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.round(months.cast("double"), 4).alias("months_since"),
    )


@query(
    "q_string_pad",
    oracle="""
        SELECT p_partkey,
               lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded,
               split_part(p_name, ' ', 1)                AS first_word,
               reverse(p_brand)                          AS rev_brand,
               repeat('ab', 3)                           AS rep
        FROM part
    """,
)
def q_string_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String padding/splitting/reverse/repeat scalars."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.reverse("p_brand").alias("rev_brand"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
    )


@query(
    "q_json_get",
    oracle="""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events WHERE props IS NOT NULL
    """,
)
def q_json_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (reference analog:
    from_json over the Kafka value, app/app3_ML.py:90)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("props").isNotNull())
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
    )


@query(
    "q_array_funcs",
    oracle="""
        SELECT vec_id,
               len(embedding)                                   AS dim,
               round(CAST(embedding[1] AS DOUBLE), 4) + 0.0     AS first_val
        FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrayType functions — size + 1-based element_at (DuckDB lists are
    1-based too). Both sides add +0.0 after rounding: DuckDB's round
    yields -0.0 for tiny negatives where Spark's yields 0.0, and the
    value hash tells them apart (surfaced at sf0.1)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        (_r(F.element_at("embedding", 1)) + F.lit(0.0)).alias("first_val"),
    )


# ---------------------------------------------------------------------------
# Time-window aggregation (batch twin of the streaming tumbling window)
# ---------------------------------------------------------------------------


@query(
    "q_window_tumbling_batch",
    oracle="""
        SELECT date_trunc('hour', ts) AS hour_start, event_type,
               count(*) AS n, round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """,
)
def q_window_tumbling_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time window via F.window() — the exact construct the
    streaming path reuses; batch mode makes it oracle-checkable."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), _r(F.sum("value")).alias("sum_value"))
        .select(
            F.col("window.start").alias("hour_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "q_window_sliding_batch",
    oracle="""
        WITH w AS (
          SELECT date_trunc('hour', ts) - u.k * INTERVAL 1 HOUR AS window_start,
                 event_type, value
          FROM events, UNNEST(generate_series(0, 1)) AS u(k)
        )
        SELECT window_start, window_start + INTERVAL 2 HOUR AS window_end,
               event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        FROM w GROUP BY 1, 2, 3
    """,
)
def q_window_sliding_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (2h duration, 1h slide) — batch twin of
    streaming.windows.sliding_agg, run through the SAME construct so
    the oracle validates the streaming semantics (each row lands in
    duration/slide = 2 windows; DuckDB mirrors via generate_series)."""
    from real_time_data_anomaly_detection_spark.streaming.windows import sliding_agg

    ev = load_table(spark, sf_dir, "events")
    return sliding_agg(
        ev,
        ts_col="ts",
        duration="2 hours",
        slide="1 hour",
        keys=("event_type",),
        watermark=None,
        aggs={"n": F.count(F.lit(1)), "sum_value": _r(F.sum("value"))},
    )


@query(
    "q_session_window_batch",
    oracle="""
        WITH o AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS brk
          FROM events WHERE user_id IS NOT NULL
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
          SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sess
          FROM o
        )
        SELECT user_id, min(ts) AS window_start,
               max(ts) + INTERVAL 30 MINUTE AS window_end,
               count(*) AS n, round(sum(value), 4) AS sum_value
        FROM s GROUP BY user_id, sess
    """,
)
def q_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30 min) per user — batch twin of
    streaming.windows.session_agg through the SAME construct. DuckDB
    mirrors Spark's merge rule (per-event windows [ts, ts+gap) merge
    while they overlap → break when the gap is >= 30 min) via the
    classic lag/cumsum islands form."""
    from real_time_data_anomaly_detection_spark.streaming.windows import session_agg

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    return session_agg(
        ev,
        ts_col="ts",
        gap="30 minutes",
        keys=("user_id",),
        aggs={"n": F.count(F.lit(1)), "sum_value": _r(F.sum("value"))},
    )


# ---------------------------------------------------------------------------
# UDF surface (vectorized pandas_udf — the sanctioned slow path)
# ---------------------------------------------------------------------------


@query(
    "q_struct_map",
    oracle="""
        SELECT event_id,
               struct_pack(t := event_type, u := user_id).t        AS stype,
               map_extract(map([event_type], [value]), event_type)[1] AS mval_raw,
               round(map_extract(map([event_type], [value]), event_type)[1], 4) AS mval
        FROM events
    """,
)
def q_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field access, map construction + key
    lookup (output scalars so hashes compare engine-neutrally)."""
    ev = load_table(spark, sf_dir, "events")
    st = F.struct(F.col("event_type").alias("t"), F.col("user_id").alias("u"))
    mp = F.create_map(F.col("event_type"), F.col("value"))
    return ev.select(
        "event_id",
        st.getField("t").alias("stype"),
        F.element_at(mp, F.col("event_type")).alias("mval_raw"),
        _r(F.element_at(mp, F.col("event_type"))).alias("mval"),
    )


@query(
    "q_pivot",
    oracle="""
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'click')    AS click,
               count(*) FILTER (WHERE event_type = 'error')    AS error,
               count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
               count(*) FILTER (WHERE event_type = 'signup')   AS signup,
               count(*) FILTER (WHERE event_type = 'view')     AS view
        FROM events GROUP BY user_id
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts, one column per event type.

    Values are enumerated explicitly — a values-less pivot triggers an
    extra distinct scan to discover them (avoid at scale)."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    pivoted = ev.groupBy("user_id").pivot("event_type", types).count()
    # Spark pivot yields NULL for absent combos; oracle's FILTER count
    # yields 0 — normalize.
    return pivoted.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


@query("q_approx_distinct")  # approximate (HLL) → no oracle; ±5% vs exact in tests
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event type — the
    constant-memory cardinality path for 100 TB (exact distinct
    shuffles every key)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users")
    )


@query(
    "q_udaf_grouped",
    oracle="""
        SELECT event_type, round(sum(value * value), 4) AS sum_sq
        FROM events GROUP BY event_type
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via GROUPED_AGG pandas_udf (Arrow-batched partial
    aggregation per group) — semantics chosen SQL-expressible so the
    mechanism itself is oracle-checked."""
    from pyspark.sql.functions import pandas_udf

    def _sum_sq(v):
        return float((v * v).sum())

    sum_sq = pandas_udf(_sum_sq, "double", F.PandasUDFType.GROUPED_AGG)

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(sum_sq("value"), 4).alias("sum_sq")
    )


@query(
    "q_regexp",
    oracle="""
        SELECT event_id,
               regexp_extract(props, '[0-9]+')          AS first_num,
               regexp_matches(props, '"k"')             AS has_k
        FROM events WHERE props IS NOT NULL
    """,
)
def q_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar functions (extract + boolean match)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("props").isNotNull()).select(
        "event_id",
        F.regexp_extract("props", "[0-9]+", 0).alias("first_num"),
        F.col("props").rlike('"k"').alias("has_k"),
    )


@query(
    "q_null_funcs",
    oracle="""
        SELECT event_id,
               coalesce(value, 0.0)                  AS v,
               CASE WHEN value = 0 THEN NULL ELSE value END AS nz,
               round(greatest(value, 50.0), 4)       AS hi,
               round(least(value, 50.0), 4)          AS lo
        FROM events
    """,
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalars: coalesce / nullif / greatest / least."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(F.col("value"), F.lit(0.0)).alias("v"),
        F.nullif(F.col("value"), F.lit(0.0)).alias("nz"),
        _r(F.greatest(F.col("value"), F.lit(50.0))).alias("hi"),
        _r(F.least(F.col("value"), F.lit(50.0))).alias("lo"),
    )


@query(
    "q_udf_scalar",
    oracle="""
        SELECT event_id, round(least(greatest(value / 100, 0), 1), 4) AS clamped01
        FROM events
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas_udf (clamp to [0,1]) — semantics
    expressible in SQL so it keeps an oracle; demonstrates the UDF
    mechanism without paying row-at-a-time Python cost."""
    from pyspark.sql.functions import pandas_udf

    # No type hints: `from __future__ import annotations` stringifies
    # them, which pandas_udf's signature inspection rejects.
    def _clamp01(v):
        return (v / 100.0).clip(0.0, 1.0)

    clamp01 = pandas_udf(_clamp01, "double")

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", _r(clamp01("value")).alias("clamped01"))


@query(
    "q_skew_salted_join",
    oracle="""
        SELECT l_returnflag, flag_label, count(*) AS n_items,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        JOIN (VALUES ('A', 'accepted'), ('N', 'new'), ('R', 'returned'))
             AS d(l_returnflag, flag_label) USING (l_returnflag)
        GROUP BY l_returnflag, flag_label
        ORDER BY l_returnflag
    """,
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pathologically skewed join (3 keys, each ~1/3 of lineitem)
    through functions.skew.salted_join: every key is detected hot,
    salted across 16 buckets, and the dim replicated per salt — yet
    row-level results are EXACTLY the plain join's, which is what the
    oracle pins. The salt is rand()-assigned, so hash-equality here
    also proves result invariance to salt placement."""
    from real_time_data_anomaly_detection_spark.functions.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    from real_time_data_anomaly_detection_spark.io import local_df

    dim = local_df(
        spark,
        [("A", "accepted"), ("N", "new"), ("R", "returned")],
        "l_returnflag string, flag_label string",
    )
    return (
        salted_join(li, dim, "l_returnflag")
        .groupBy("l_returnflag", "flag_label")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )
