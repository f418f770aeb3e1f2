"""Generator fixture tests: schema parity + reference value semantics
(producer/producer-3.py formulas, see FIXTURES.md A)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.schemas import (
    ENERGY_SCHEMA,
    PLANT_FEATURES,
    PLANT_TYPES,
)
from real_time_data_anomaly_detection_spark.streaming.generator import energy_batch


def test_schema_matches_wire_schema(spark):
    df = energy_batch(spark, n_rows=200)
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in ENERGY_SCHEMA.fields}
    want["is_anomaly"] = "boolean"  # fixture-only ground-truth label
    assert got == want


def test_deterministic(spark):
    a = energy_batch(spark, n_rows=500, seed=42).collect()
    b = energy_batch(spark, n_rows=500, seed=42).collect()
    assert a == b


def test_sparse_wide_nulls(spark):
    df = energy_batch(spark, n_rows=2000).cache()
    try:
        for plant, features in PLANT_FEATURES.items():
            specific = [f for f in features if f not in ("power_output", "demand")]
            sub = df.filter(F.col("plant_type") == plant)
            assert sub.count() > 0
            # Own metrics populated...
            for m in specific:
                assert sub.filter(F.col(m).isNull()).count() == 0, (plant, m)
            # ...every other plant's metrics null.
            others = {
                m
                for p, fs in PLANT_FEATURES.items()
                if p != plant
                for m in fs
                if m not in ("power_output", "demand")
            }
            for m in others:
                assert sub.filter(F.col(m).isNotNull()).count() == 0, (plant, m)
    finally:
        df.unpersist()


def test_value_ranges_and_anomaly_rate(spark):
    df = energy_batch(spark, n_rows=4000).cache()
    try:
        row = df.agg(
            F.min("power_output").alias("pmin"),
            F.max("power_output").alias("pmax"),
            F.min("grid_frequency").alias("gmin"),
            F.max("grid_frequency").alias("gmax"),
            F.avg(F.col("is_anomaly").cast("int")).alias("anom_rate"),
        ).head()
        # power = 100 ± 30 seasonal ± 5 noise → [65, 135]
        assert 60 <= row.pmin and row.pmax <= 140
        # grid freq = 50 ± 0.1 ± 0.05
        assert 49.8 <= row.gmin and row.gmax <= 50.2
        # injected anomaly probability 0.1 (producer/producer-3.py:113)
        assert 0.06 <= row.anom_rate <= 0.14
        # all plant types present
        assert {
            r.plant_type for r in df.select("plant_type").distinct().collect()
        } == set(PLANT_TYPES)
        # non-negativity clamp
        for m in ("power_output", "demand", "wind_speed", "emissions"):
            assert df.filter(F.col(m) < 0).count() == 0
    finally:
        df.unpersist()
