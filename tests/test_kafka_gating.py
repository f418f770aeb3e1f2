"""Kafka connector gating: the spark-sql-kafka package is not shipped
in this environment; the source must fail at .load() with the standard
deployment error (and nothing in the repo's default paths may require
it)."""

from __future__ import annotations

import pytest
from pyspark.errors.exceptions.captured import AnalysisException

from real_time_data_anomaly_detection_spark.streaming.source import kafka_energy_source


def test_kafka_source_fails_cleanly_without_package(spark):
    with pytest.raises(AnalysisException, match="kafka"):
        kafka_energy_source(spark, "localhost:9092", "energy_stream")
