"""Operator registry: every declared query with its DuckDB oracle twin.

Importing this package populates :data:`REGISTRY` with all batch
relational + LLM-pipeline queries. ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over it.
"""

from __future__ import annotations

from real_time_data_anomaly_detection_spark.operators.registry import (
    REGISTRY,
    Query,
    query,
)

# Import for registration side effects.
from real_time_data_anomaly_detection_spark.operators import (  # noqa: E402,F401
    relational,
    llm_ops,
    dedup,
    textops,
    asof,
    tpch,
    sqlx,
    similarity,
    pipeline_ops,
    timeseries,
    clustering,
    quantization,
    curation,
    graph,
    bloom,
    sketch,
    bpe,
    behavior,
    sharding,
)

__all__ = ["REGISTRY", "Query", "query"]
