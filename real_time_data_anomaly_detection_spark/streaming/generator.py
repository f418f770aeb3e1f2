"""Spark-native synthetic energy-telemetry generator.

Re-expresses the reference producer's semantics (reference
producer/producer-3.py:48-132) as pure Catalyst column expressions, so
the same logic runs:

- batch: ``spark.range(n)`` → DataFrame (test fixtures, detection-quality
  harness — keeps the injected ``is_anomaly`` ground-truth label);
- streaming: ``readStream.format("rate")`` → unbounded stream at any
  rows/sec (the reference producer is hard-capped at 8 events/s by its
  sleep loop, producer/producer-3.py:159).

Formula parity (producer/producer-3.py line refs):
  seasonality 62-75, drift 78, noise 85-87, per-type metrics 91-110,
  anomaly injection 112-125 (p=0.1, per-type multipliers), clamp 128-130,
  ISO timestamps 82. All JVM-side: sin/rand/when/greatest — no UDFs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.schemas import PLANT_TYPES, REGIONS

_TWO_PI = 2.0 * math.pi


def _uniform(lo: float, hi: float, seed: int):
    """U(lo, hi) as a column; deterministic per (seed, partition, row)."""
    return F.rand(seed) * (hi - lo) + lo


def _pick(options: tuple[str, ...], seed: int):
    """Uniform categorical pick (reference producer/producer-3.py:59-60)."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.rand(seed) * len(options) + 1).cast("int"))


def with_energy_columns(df: DataFrame, counter_col: str, ts_col, seed: int = 42) -> DataFrame:
    """Add the full 14-column energy schema + is_anomaly ground truth.

    ``df`` needs a monotonically increasing ``counter_col`` (long); every
    other column is derived. Deterministic for a fixed partitioning.
    """
    c = F.col(counter_col).cast("double")
    t = c / 100.0  # simulated time-of-day counter (FIXTURES.md A)

    base = (
        df.withColumn("timestamp", ts_col)
        .withColumn("plant_type", _pick(PLANT_TYPES, seed + 1))
        .withColumn("region", _pick(REGIONS, seed + 2))
        .withColumn(
            "power_output",
            F.lit(100.0) + 30.0 * F.sin(_TWO_PI * t / 24.0) + _uniform(-5, 5, seed + 3),
        )
        .withColumn(
            "demand",
            F.lit(200.0)
            + 50.0 * F.sin(_TWO_PI * t / 24.0 + math.pi / 4.0)
            + 0.05 * c  # concept drift (producer/producer-3.py:78)
            + _uniform(-10, 10, seed + 4),
        )
        .withColumn(
            "grid_frequency",
            F.lit(50.0) + 0.1 * F.sin(_TWO_PI * t / 12.0) + _uniform(-0.05, 0.05, seed + 5),
        )
        .withColumn("is_anomaly", F.rand(seed + 6) < 0.1)
    )

    pt = F.col("plant_type")
    is_anom = F.col("is_anomaly")

    def _per_type(plant: str, normal, anom_factor):
        """Metric present only for `plant`, scaled when anomalous
        (producer/producer-3.py:91-125)."""
        value = normal * F.when(is_anom, anom_factor).otherwise(F.lit(1.0))
        return F.when(pt == plant, value).otherwise(F.lit(None).cast("double"))

    gas_fuel = (
        F.lit(300.0) + 20.0 * F.sin(_TWO_PI * t / 24.0) + _uniform(-10, 10, seed + 7)
    )
    metrics = base.select(
        "*",
        _per_type("Gas Plant", gas_fuel, _uniform(1.5, 2.0, seed + 20)).alias(
            "fuel_consumption"
        ),
        _per_type(
            "Gas Plant", _uniform(100, 300, seed + 8), _uniform(1.2, 1.5, seed + 21)
        ).alias("emissions"),
        _per_type(
            "Wind Farm", _uniform(3, 25, seed + 9), _uniform(0.5, 0.7, seed + 22)
        ).alias("wind_speed"),
        _per_type(
            "Wind Farm", _uniform(80, 95, seed + 10), _uniform(0.5, 0.8, seed + 23)
        ).alias("turbine_efficiency"),
        _per_type(
            "Solar Farm", _uniform(200, 1000, seed + 11), _uniform(1.5, 2.0, seed + 24)
        ).alias("solar_radiation"),
        _per_type(
            "Solar Farm", _uniform(20, 80, seed + 12), _uniform(1.2, 1.5, seed + 25)
        ).alias("panel_temperature"),
        _per_type(
            "Hydroelectric Plant",
            _uniform(50, 300, seed + 13),
            _uniform(1.5, 2.0, seed + 26),
        ).alias("water_flow_rate"),
        _per_type(
            "Hydroelectric Plant",
            _uniform(100, 500, seed + 14),
            _uniform(0.5, 0.7, seed + 27),
        ).alias("turbine_rotation_speed"),
    )

    # Clamp every numeric at zero (producer/producer-3.py:128-130).
    clamped = metrics
    for m in (
        "power_output",
        "demand",
        "grid_frequency",
        "fuel_consumption",
        "emissions",
        "wind_speed",
        "turbine_efficiency",
        "solar_radiation",
        "panel_temperature",
        "water_flow_rate",
        "turbine_rotation_speed",
    ):
        clamped = clamped.withColumn(
            m,
            F.when(F.col(m).isNotNull(), F.greatest(F.col(m), F.lit(0.0))).otherwise(
                F.lit(None).cast("double")
            ),
        )
    cols = [
        "timestamp",
        "plant_type",
        "region",
        "power_output",
        "demand",
        "grid_frequency",
        "fuel_consumption",
        "emissions",
        "wind_speed",
        "turbine_efficiency",
        "solar_radiation",
        "panel_temperature",
        "water_flow_rate",
        "turbine_rotation_speed",
        "is_anomaly",
    ]
    return clamped.select(*cols)


def energy_batch(
    spark: SparkSession,
    n_rows: int = 4000,
    seed: int = 42,
    num_partitions: int = 8,
    start: str = "2024-01-01 00:00:00",
) -> DataFrame:
    """Deterministic batch fixture: n_rows events, 8 events/s of
    simulated time (producer cadence, producer/producer-3.py:159)."""
    base = spark.range(0, n_rows, numPartitions=num_partitions).withColumnRenamed(
        "id", "counter"
    )
    ts = F.timestamp_micros(
        (F.lit(start).cast("timestamp").cast("double") * 1_000_000).cast("long")
        + (F.col("counter") * 125_000).cast("long")  # 0.125 s per event
    )
    return with_energy_columns(base, "counter", ts, seed)


def energy_rate_stream(
    spark: SparkSession, rows_per_second: int = 1000, seed: int = 42
) -> DataFrame:
    """Unbounded synthetic stream via the rate source — the test/bench
    stand-in for the Kafka topic, at any sustainable rate."""
    base = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .withColumnRenamed("value", "counter")
    )
    return with_energy_columns(base, "counter", F.col("timestamp"), seed)
