"""As-of and interval (range) joins — time-series operators Spark has
no built-in for, composed from sort + window primitives.

As-of join strategy (the "union trick"): tag both sides, union on the
shared key/time axis, sort within each key by (time, side-priority,
tiebreak), then ``last(right_value, ignoreNulls=True)`` over an
unbounded-preceding frame propagates the most recent right-side row to
every left row. One shuffle on the key — same cost as a regular
sort-merge join, no n² candidate blowup, skew-safe under AQE.

DuckDB's native ASOF JOIN (a.ts >= b.ts semantics, equal timestamps
match) is the oracle; tie order is handled by sorting right-side rows
before left-side rows at identical timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.io import load_table
from real_time_data_anomaly_detection_spark.operators.registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    left_prefix: str = "",
    right_prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the newest right row with
    right.on <= left.on within the same ``by`` group.

    Returns all left columns + ``right_prefix``-ed ``value_cols`` (+ the
    matched right timestamp as ``right_prefix + on``).
    """
    lcols = left.columns
    l_tagged = left.select(
        *lcols, F.lit(1).alias("_side"), *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols], F.lit(None).cast(right.schema[on].dataType).alias("_r_on")
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in by + [on] else F.col(c) for c in lcols],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(on).alias("_r_on"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows (side=0) sort before left rows at equal times → equal
    # timestamps match, per ASOF >= semantics. Trailing value-col sort
    # keys break ties among right rows sharing a timestamp (the max
    # value tuple wins), making results partition-order independent.
    w = (
        W.partitionBy(*by)
        .orderBy(
            F.col(on).asc(),
            F.col("_side").asc(),
            *[F.col(f"_r_{c}").asc_nulls_first() for c in value_cols],
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # Propagate ONE struct per matched right row, not independent
    # last() per column: per-column propagation could stitch fields
    # from different right rows when a value_col is NULL in the
    # matched row (each last() skips nulls independently). The struct
    # is NULL for left rows so last(ignorenulls) skips them.
    r_struct = F.when(
        F.col("_side") == 0,
        F.struct(
            *[F.col(f"_r_{c}").alias(c) for c in value_cols],
            F.col("_r_on").alias("__asof_on"),
        ),
    )
    filled = unioned.select(
        *lcols,
        "_side",
        F.last(r_struct, ignorenulls=True).over(w).alias("_r_struct"),
    )
    return filled.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col(f"_r_struct.{c}").alias(f"{right_prefix}{c}") for c in value_cols],
        F.col("_r_struct.__asof_on").alias(f"{right_prefix}{on}"),
    )


@query(
    "q_asof_join",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts,
               c.event_id AS asof_event_id, c.ts AS asof_ts
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event, the most recent prior click by the same
    user (NULL when none) — checked against DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    return asof_join(
        errors, clicks, on="ts", by=["user_id"], value_cols=["event_id"]
    )


@query(
    "q_join_interval",
    oracle="""
        SELECT a.event_id AS event_a, b.event_id AS event_b
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_id < b.event_id
         AND b.ts BETWEEN a.ts AND a.ts + INTERVAL 5 MINUTE
    """,
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: same-user event pairs within a 5-minute
    forward window. The user_id equality key makes this a plain
    shuffle join with a range residual — no BNLJ."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    a = ev.select(
        F.col("event_id").alias("event_a"), "user_id", F.col("ts").alias("ts_a")
    )
    b = ev.select(
        F.col("event_id").alias("event_b"), "user_id", F.col("ts").alias("ts_b")
    )
    return (
        a.join(
            b,
            (a.user_id == b.user_id)
            & (F.col("event_a") < F.col("event_b"))
            & (F.col("ts_b") >= F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 5 MINUTE")),
        )
        .select("event_a", "event_b")
    )
