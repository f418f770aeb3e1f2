"""Source/sink connector registry (batch + streaming)."""

from real_time_data_anomaly_detection_spark.sources.registry import (
    read_batch,
    read_stream,
    write_batch,
)

__all__ = ["read_batch", "read_stream", "write_batch"]
