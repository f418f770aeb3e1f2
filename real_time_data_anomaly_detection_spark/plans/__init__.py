"""Physical-plan inspection utilities (explain-based assertions)."""

from real_time_data_anomaly_detection_spark.plans.inspect import (
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    has_pushed_filters,
    live_exchanges,
    scan_read_schema,
)

__all__ = [
    "formatted_plan",
    "has_broadcast_join",
    "has_pushed_filters",
    "count_exchanges",
    "live_exchanges",
    "scan_read_schema",
]
