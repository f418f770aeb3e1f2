"""Time-series resampling: regular-grid densification + gap fill.

The reference's stream is irregular (producer sleeps, drops, bursts —
reference producer/producer-3.py:159); any dashboard or model training
on top of it needs a REGULAR grid. This module turns an event stream
into per-key fixed-interval rows with forward-filled values — the
batch analog of what a downsampling/rollup pipeline does continuously.

Scale shape: the grid is generated per key from that key's own
[min, max] hour bounds (one small agg), exploded JVM-side, and joined
to the hourly aggregate on (key, hour) — both sides are already
aggregated, so the join is grid-sized, never event-sized. The forward
fill is one window pass per key ordered by grid time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.io import load_table
from real_time_data_anomaly_detection_spark.operators.registry import query


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval: str = "1 hour",
) -> DataFrame:
    """(key, slot, avg_value, avg_value_ffill): per-key regular grid at
    ``interval`` with the slot's average value and its forward-filled
    version (last non-null earlier slot; leading gaps stay null).

    Missing slots appear with ``avg_value`` null — the gap REPORT —
    while ``avg_value_ffill`` carries the last observation forward —
    the gap REPAIR. Both in one pass so callers can distinguish
    measured from imputed values."""
    trunc_unit = interval.split()[-1].rstrip("s")
    bounds = df.groupBy(key_col).agg(
        F.date_trunc(trunc_unit, F.min(ts_col)).alias("_t0"),
        F.date_trunc(trunc_unit, F.max(ts_col)).alias("_t1"),
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence("_t0", "_t1", F.expr(f"INTERVAL {interval}"))
        ).alias("slot"),
    )
    actual = df.groupBy(
        key_col, F.date_trunc(trunc_unit, F.col(ts_col)).alias("slot")
    ).agg(F.round(F.avg(value_col).cast("double"), 4).alias("avg_value"))
    w = (
        Window.partitionBy(key_col)
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(actual, [key_col, "slot"], "left")
        .withColumn(
            "avg_value_ffill", F.last("avg_value", ignorenulls=True).over(w)
        )
        .select(key_col, "slot", "avg_value", "avg_value_ffill")
    )


@query(
    "q_resample_ffill",
    oracle="""
        WITH bounds AS (
            SELECT event_type, date_trunc('hour', min(ts)) AS t0,
                   date_trunc('hour', max(ts)) AS t1
            FROM events GROUP BY event_type
        ),
        grid AS (
            SELECT event_type,
                   unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS slot
            FROM bounds
        ),
        actual AS (
            SELECT event_type, date_trunc('hour', ts) AS slot,
                   round(avg(value), 4) AS avg_value
            FROM events GROUP BY 1, 2
        )
        SELECT g.event_type, g.slot, a.avg_value,
               last_value(a.avg_value IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.slot
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS avg_value_ffill
        FROM grid g
        LEFT JOIN actual a
          ON g.event_type = a.event_type AND g.slot = a.slot
    """,
)
def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of events per event_type with forward fill —
    regular-grid densification over an irregular stream."""
    e = load_table(spark, sf_dir, "events")
    return resample_ffill(e, "event_type", "ts", "value", "1 hour")
