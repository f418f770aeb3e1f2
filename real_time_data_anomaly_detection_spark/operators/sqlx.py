"""Extended SQL surface: ranking variants, exact percentiles, ordered
string aggregation, arg-max, and subquery forms (scalar + correlated)
executed through spark.sql — demonstrating the engine's full SQL entry
point alongside the DataFrame DSL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.io import load_table
from real_time_data_anomaly_detection_spark.operators.registry import query


@query(
    "q_window_ntile",
    oracle="""
        SELECT event_id,
               ntile(4)       OVER w AS quartile,
               dense_rank()   OVER w AS drnk,
               round(percent_rank() OVER w, 4) AS prnk
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / dense_rank / percent_rank ranking variants."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        F.ntile(4).over(w).alias("quartile"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 4).alias("prnk"),
    )


@query(
    "q_percentile",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4)  AS p50,
               round(quantile_cont(value, 0.95), 4) AS p95
        FROM events GROUP BY event_type
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) percentiles per group — both engines use
    linear interpolation for continuous quantiles."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
    )


@query("q_approx_percentile")  # sketch-based → rows-only + tolerance test
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile per group — the constant-memory companion to
    q_percentile. Exact percentile materializes every group's values
    (memory grows with group size — a straggler/OOM at 100 TB);
    the KLL/GK-style sketch aggregates in bounded space with map-side
    partial merge. Accuracy vs exact is pinned to ±1% of the value
    range in tests/test_approx.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("approx_percentile(value, 0.5, 10000)"), 4).alias("p50"),
        F.round(F.expr("approx_percentile(value, 0.95, 10000)"), 4).alias("p95"),
    )


@query(
    "q_string_agg",
    oracle="""
        SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
        FROM nation GROUP BY n_regionkey
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (array_sort makes the concat order
    deterministic — collect_list alone is partition-order dependent)."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("names")
    )


@query(
    "q_argmax",
    oracle="""
        WITH ranked AS (
            SELECT event_type, event_id,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value DESC, event_id DESC) AS rmax,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value ASC, event_id ASC)  AS rmin
            FROM events)
        SELECT event_type,
               max(CASE WHEN rmax = 1 THEN event_id END) AS top_event,
               max(CASE WHEN rmin = 1 THEN event_id END) AS bottom_event
        FROM ranked GROUP BY event_type
    """,
)
def q_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by with a composite (value, id) ordering key — the id
    tiebreak matters: events.value has thousands of duplicate values."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("max_by(event_id, struct(value, event_id))").alias("top_event"),
        F.expr("min_by(event_id, struct(value, event_id))").alias("bottom_event"),
    )


@query(
    "q_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): per-status,
    per-priority, and grand total in one pass."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM v_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q_posexplode",
    oracle="""
        SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
               round(CAST(unnest(embedding) AS DOUBLE), 4) + 0.0 AS v
        FROM embeddings WHERE vec_id < 10
    """,
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral positional explode of an array column (1-based index to
    match DuckDB's generate_subscripts). +0.0 after round on both
    sides normalizes DuckDB's -0.0 for tiny negative components."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.filter(F.col("vec_id") < 10)
        .select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select(
            "vec_id",
            (F.col("pos") + 1).cast("bigint").alias("idx"),
            (F.round(F.col("val").cast("double"), 4) + F.lit(0.0)).alias("v"),
        )
    )


@query(
    "q_unpivot",
    oracle="""
        SELECT l_orderkey, l_linenumber, metric, round(val, 4) AS v
        FROM (UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
                       FROM lineitem WHERE l_orderkey % 10 = 0)
              ON l_quantity, l_discount, l_tax INTO NAME metric VALUE val)
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide metric columns → (metric, value) long form —
    a narrow transform, no shuffle. The orderkey-slice filter keeps the
    driver-gate output bounded (~18k rows at sf0.01 instead of 180k —
    the gate hashes every row driver-side) with identical operator
    coverage."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    return (
        li.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_discount", "l_tax"],
            "metric",
            "val",
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "metric",
            F.round(F.col("val").cast("double"), 4).alias("v"),
        )
    )


@query(
    "q_nullsafe_join",
    oracle="""
        SELECT a.event_id AS ea, b.event_id AS eb
        FROM (SELECT event_id, CASE WHEN value < 1 THEN NULL
                                    ELSE round(value, 0) END AS k
              FROM events WHERE event_id < 200) a
        JOIN (SELECT event_id, CASE WHEN value < 1 THEN NULL
                                    ELSE round(value, 0) END AS k
              FROM events WHERE event_id >= 200 AND event_id < 400) b
          ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other, unlike a plain equi-join."""
    ev = load_table(spark, sf_dir, "events")
    key = F.when(F.col("value") < 1, F.lit(None)).otherwise(F.round("value", 0))
    a = ev.filter(F.col("event_id") < 200).select(
        F.col("event_id").alias("ea"), key.alias("ka")
    )
    b = ev.filter((F.col("event_id") >= 200) & (F.col("event_id") < 400)).select(
        F.col("event_id").alias("eb"), key.alias("kb")
    )
    return a.join(b, F.col("ka").eqNullSafe(F.col("kb"))).select("ea", "eb")


@query(
    "q_first_last_window",
    oracle="""
        SELECT event_id, event_type,
               first_value(event_id) OVER w AS first_id,
               last_value(event_id)  OVER w AS last_id,
               nth_value(event_id, 2) OVER w AS second_id
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_first_last_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value over an explicit full-partition
    frame (the default frame would make last_value = current row)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "event_type",
        F.first("event_id").over(w).alias("first_id"),
        F.last("event_id").over(w).alias("last_id"),
        F.nth_value("event_id", 2).over(w).alias("second_id"),
    )


@query(
    "q_scalar_subquery",
    oracle="""
        SELECT o_orderkey, round(o_totalprice, 4) AS total
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery via the spark.sql entry point."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 4) AS total
        FROM v_orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM v_orders)
        """
    )


@query(
    "q_correlated_subquery",
    oracle="""
        SELECT c_custkey,
               (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        FROM customer
    """,
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + outer join (no per-row re-execution, unlike the naive
    nested-loop reading of the SQL)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders2")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer2")
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT count(*) FROM v_orders2 WHERE o_custkey = c_custkey) AS n_orders
        FROM v_customer2
        """
    )


@query(
    "q_window_range_frame",
    oracle="""
        SELECT event_id,
               round(sum(value) OVER w, 4) AS sum_1h,
               count(*) OVER w AS n_1h
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-type trailing-1h moving sum+count
    (sum, not avg: frame averages are sums over small power-of-two
    counts, which land EXACTLY on 4-decimal rounding halves ~12% of
    the time — engines then disagree by one ulp of summation order;
    callers derive avg = sum/n).

    RANGE frames are value-based, so ties in ts share one frame —
    deterministic without a tiebreak (unlike ROWS frames). Spark's
    rangeBetween needs a numeric ordering key; epoch MICROSECONDS via
    pure NTZ arithmetic (timestampdiff from the NTZ epoch — no session
    tz involved, integer-exact at full precision, unlike
    unix_timestamp's second truncation)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy(
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            )
        )
        .rangeBetween(-3600 * 1000000, 0)
    )
    return ev.select(
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("sum_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


@query(
    "q_percent_rank",
    oracle="""
        SELECT event_id,
               round(percent_rank() OVER w, 4) AS prank,
               round(cume_dist()    OVER w, 4) AS cdist
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY value)
    """,
)
def q_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank analytics: percent_rank + cume_dist (value-based,
    so ties are deterministic)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value")
    return ev.select(
        "event_id",
        F.round(F.percent_rank().over(w), 4).alias("prank"),
        F.round(F.cume_dist().over(w), 4).alias("cdist"),
    )


@query(
    "q_histogram",
    oracle="""
        SELECT event_type, CAST(floor(value / 50) AS BIGINT) AS bin,
               count(*) AS n
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram per group: bin = floor(value/50) — binning
    plus count is one partial-aggregated pass (the building block for
    distribution profiling over a 100 TB column)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ev.groupBy(
        "event_type", F.floor(F.col("value") / 50).alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_stats_agg",
    oracle="""
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 4)                 AS sd_qty,
               round(var_samp(l_quantity), 4)                    AS var_qty,
               round(corr(l_quantity, l_extendedprice), 4)       AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price
        FROM lineitem GROUP BY l_returnflag
    """,
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/correlation/covariance)
    per group — single-pass, re-aggregatable moment sketches in both
    engines, so the 100 TB path is one partial-agg exchange like any
    sum."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_qty_price"),
    )


@query(
    "q_mode",
    oracle="""
        SELECT event_type, CAST(min(m) AS BIGINT) AS mode_user
        FROM (
          SELECT event_type, user_id AS m,
                 rank() OVER (PARTITION BY event_type
                              ORDER BY count(*) DESC) AS r
          FROM events WHERE user_id IS NOT NULL
          GROUP BY event_type, user_id
        ) WHERE r = 1 GROUP BY event_type
    """,
)
def q_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent user per event type (mode), smallest-id tiebreak —
    expressed as count + rank in both engines so ties are
    deterministic (native mode() functions break ties arbitrarily)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    counts = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("_n"))
    r = F.rank().over(W.partitionBy("event_type").orderBy(F.desc("_n")))
    return (
        counts.withColumn("_r", r)
        .filter(F.col("_r") == 1)
        .groupBy("event_type")
        .agg(F.min("user_id").alias("mode_user"))
    )


@query(
    "q_explode_outer",
    oracle="""
        SELECT e.event_id, u.tok
        FROM (SELECT event_id,
                     CASE WHEN event_type = 'click' THEN NULL
                          ELSE string_split(event_type, 'i') END AS toks
              FROM events WHERE event_id < 100) e
        LEFT JOIN LATERAL UNNEST(e.toks) AS u(tok) ON true
    """,
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving lateral explode: rows with a NULL array survive
    with a NULL element (plain explode would drop them — the classic
    silent-data-loss footgun)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    toks = F.when(
        F.col("event_type") != "click", F.split(F.col("event_type"), "i")
    )
    return ev.select("event_id", toks.alias("toks")).select(
        "event_id", F.explode_outer("toks").alias("tok")
    )


@query(
    "q_topk_per_group",
    oracle="""
        SELECT event_type, event_id, round(value, 4) AS v
        FROM (SELECT event_type, event_id, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value DESC, event_id ASC) AS r
              FROM events)
        WHERE r <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group (window rank + filter). Unlike global top-k
    (TakeOrderedAndProject), per-group top-k is one exchange + partition
    sort; Spark's WindowGroupLimit pushes the limit below the sort so
    each partition keeps only k rows early."""
    ev = load_table(spark, sf_dir, "events")
    r = F.row_number().over(
        W.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    )
    return (
        ev.select("event_type", "event_id", F.round("value", 4).alias("v"), r.alias("_r"))
        .filter(F.col("_r") <= 3)
        .drop("_r")
    )


@query(
    "q_join_full_outer",
    oracle="""
        SELECT a.event_id AS ea, b.event_id AS eb
        FROM (SELECT event_id, user_id FROM events
              WHERE event_id < 300 AND user_id IS NOT NULL) a
        FULL OUTER JOIN
             (SELECT event_id, user_id FROM events
              WHERE event_id >= 300 AND event_id < 600 AND user_id IS NOT NULL) b
          ON a.user_id = b.user_id
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: unmatched rows from BOTH sides survive with
    NULLs — the one join family the salting helper refuses (it cannot
    preserve unmatched replicated rows), so it goes through the plain
    shuffle join + AQE skew handling."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    a = ev.filter(F.col("event_id") < 300).select(
        F.col("event_id").alias("ea"), F.col("user_id").alias("ka")
    )
    b = ev.filter((F.col("event_id") >= 300) & (F.col("event_id") < 600)).select(
        F.col("event_id").alias("eb"), F.col("user_id").alias("kb")
    )
    return a.join(b, a.ka == b.kb, "full_outer").select("ea", "eb")


@query(
    "q_conditional_agg",
    oracle="""
        SELECT event_type,
               count(*) FILTER (WHERE value > 50)        AS n_high,
               bool_and(value IS NOT NULL)               AS all_present,
               bool_or(value > 99)                       AS any_extreme,
               round(sum(CASE WHEN value > 50 THEN value
                              ELSE 0 END), 4)            AS sum_high
        FROM events GROUP BY event_type
    """,
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: filtered counts, boolean every/any,
    and a guarded sum — all one partial-aggregated pass."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 50).alias("n_high"),
        F.every(F.col("value").isNotNull()).alias("all_present"),
        F.some(F.col("value") > 99).alias("any_extreme"),
        F.round(
            F.sum(F.when(F.col("value") > 50, F.col("value")).otherwise(0.0)), 4
        ).alias("sum_high"),
    )


@query(
    "q_levenshtein",
    oracle="""
        SELECT c_custkey, levenshtein(c_name, 'Customer#000000042') AS dist
        FROM customer WHERE c_custkey <= 200
    """,
)
def q_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance scoring against a probe string — the fuzzy-match
    primitive for entity resolution (both engines implement
    Wagner-Fischer; identical integer distances)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.levenshtein(F.col("c_name"), F.lit("Customer#000000042")).alias("dist"),
    )


@query(
    "q_window_lead",
    oracle="""
        SELECT event_id, user_id,
               round(lead(value, 2, -1.0) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id), 4) AS next2
        FROM events
    """,
)
def q_window_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead() with offset 2 and an explicit default — the forward
    counterpart of q_window_lag (and the default-value form, which
    lag/lead at offset 1 with NULL default doesn't cover)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.lead("value", 2, -1.0).over(w), 4).alias("next2"),
    )


@query(
    "q_cross_join",
    oracle="""
        SELECT r.r_name, n.n_name
        FROM region r CROSS JOIN nation n
    """,
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (5 x 25 dims) — plans a
    BroadcastNestedLoopJoin, which is exactly right when one side is
    tiny and there is no key; the engine refuses accidental cartesians
    on big inputs (spark.sql.crossJoin semantics) unless crossJoin is
    explicit like this."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@query(
    "q_lateral_join",
    oracle="""
        SELECT n.n_name, t.o_orderkey, t.o_totalprice
        FROM nation n,
        LATERAL (
            SELECT o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY o.o_totalprice DESC, o.o_orderkey
            LIMIT 2) t
        ORDER BY n.n_name, o_totalprice DESC, t.o_orderkey
    """,
)
def q_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: per nation, its two highest-value
    orders — the per-row-subquery join form (Spark 3.4+ LATERAL,
    planned as a WindowGroupLimit-style per-group top-k here rather
    than N correlated executions)."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("_lat_nation")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.o_orderkey, t.o_totalprice
        FROM _lat_nation n,
        LATERAL (
            SELECT o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice
            FROM _lat_orders o JOIN _lat_customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY o.o_totalprice DESC, o.o_orderkey
            LIMIT 2) t
        ORDER BY n.n_name, o_totalprice DESC, t.o_orderkey
        """
    )


@query(
    "q_cume_dist",
    oracle="""
        SELECT event_type, event_id,
               round(cume_dist() OVER (PARTITION BY event_type ORDER BY value), 4)
                   AS cd
        FROM events
        WHERE event_id < 500
        ORDER BY event_type, event_id
    """,
)
def q_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist window — the distribution-function companion to
    percent_rank/ntile already declared."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    w = Window.partitionBy("event_type").orderBy("value")
    return ev.select(
        "event_type",
        "event_id",
        F.round(F.cume_dist().over(w), 4).alias("cd"),
    ).orderBy("event_type", "event_id")


@query(
    "q_json_flatten",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
                    AS BIGINT) AS sum_k,
               max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        FROM events
        WHERE props IS NOT NULL
        GROUP BY event_type ORDER BY event_type
    """,
)
def q_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON flattening: from_json with a DECLARED
    struct schema (not per-field get_json_object — one parse per row,
    then ordinary typed columns) feeding a grouped aggregate."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    parsed = ev.select(
        "event_type", F.from_json("props", "k INT").alias("p")
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("p.k").alias("sum_k"),
            F.max("p.k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "q_grouping_id",
    oracle="""
        SELECT coalesce(l_returnflag, '<all>') AS flag,
               coalesce(l_linestatus, '<all>') AS status,
               GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
               count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        ORDER BY gid, flag, status
    """,
)
def q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with grouping-bit disambiguation: the gid column
    tells subtotal rows apart from genuine NULL group values — the
    detail q_grouping_sets elides. Same partial-aggregated single-scan
    plan; the expand operator fans each input row per set."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gid_lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, '<all>') AS flag,
               coalesce(l_linestatus, '<all>') AS status,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
                   AS gid,
               count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM _gid_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        ORDER BY gid, flag, status
        """
    )
