"""Event-time window aggregations + watermarking.

The reference has no time windows at all (its window is count-based,
reference app/app3_ML.py:39-45); these are the idiomatic-Spark
replacements, identical in batch and streaming (batch twins are the
oracle-checked q_window_tumbling_batch path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "timestamp",
    duration: str = "1 minute",
    keys: tuple[str, ...] = ("plant_type",),
    watermark: str | None = "2 minutes",
    aggs: dict | None = None,
) -> DataFrame:
    """Tumbling window aggregate; watermark bounds state + drops late rows."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    agg_exprs = aggs or {
        "n": F.count(F.lit(1)),
        "avg_power": F.avg("power_output"),
        "avg_demand": F.avg("demand"),
    }
    return (
        df.groupBy(F.window(ts_col, duration).alias("win"), *keys)
        .agg(*[expr.alias(name) for name, expr in agg_exprs.items()])
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            *agg_exprs.keys(),
        )
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str = "timestamp",
    duration: str = "10 minutes",
    slide: str = "1 minute",
    keys: tuple[str, ...] = ("plant_type",),
    watermark: str | None = "2 minutes",
    aggs: dict | None = None,
) -> DataFrame:
    """Sliding window aggregate (each row lands in duration/slide windows)."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    agg_exprs = aggs or {"n": F.count(F.lit(1)), "avg_power": F.avg("power_output")}
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("win"), *keys)
        .agg(*[expr.alias(name) for name, expr in agg_exprs.items()])
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            *agg_exprs.keys(),
        )
    )


def session_agg(
    df: DataFrame,
    ts_col: str = "timestamp",
    gap: str = "5 minutes",
    keys: tuple[str, ...] = ("plant_type",),
    watermark: str = "2 minutes",
    aggs: dict | None = None,
) -> DataFrame:
    """Gap-based session windows (streaming requires a watermark)."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    agg_exprs = aggs or {"n": F.count(F.lit(1))}
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("win"), *keys)
        .agg(*[expr.alias(name) for name, expr in agg_exprs.items()])
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            *agg_exprs.keys(),
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "5 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with the event-time range bound that
    makes state finite: right rows join left rows within
    [left_ts, left_ts + max_delay].

    Both sides carry watermarks so Spark can evict join state — without
    the time bound + watermarks, stream-stream join state grows forever
    (the #1 way to OOM a long-running job). Outer variants additionally
    need the watermark to know when to emit unmatched rows.
    """
    l_wm = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r_wm = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (l_wm[key] == r_wm[key])
        & (r_wm[right_ts] >= l_wm[left_ts])
        & (r_wm[right_ts] <= F.expr(f"{left_ts} + INTERVAL {max_delay}"))
    )
    # Expression joins keep both key columns; drop the right one so the
    # output has a single unambiguous `key`.
    return l_wm.join(r_wm, cond, how).drop(r_wm[key])


def stream_dedup(
    df: DataFrame, keys: list[str], ts_col: str = "timestamp", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming dropDuplicates with watermark-bounded state."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
        return df.dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
