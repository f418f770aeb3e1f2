"""Streaming sources: Kafka (production) + file/rate (tests).

Kafka parity with the reference consumer (reference app/app3_ML.py:79-93):
subscribe → cast value to string → from_json against the fixed schema →
flatten → event-time cast. The parse pipeline is shared between batch
and streaming DataFrames (identical Catalyst plan either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.schemas import ENERGY_WIRE_SCHEMA


def parse_energy_json(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka/raw bytes → typed energy rows.

    Mirrors reference app/app3_ML.py:89-93 (CAST value AS STRING →
    from_json → data.* → to_timestamp). Malformed rows yield all-null
    structs (from_json's PERMISSIVE default) and are dropped by the
    timestamp null filter — the scale-safe corrupt-record policy.
    ``try_to_timestamp``, not ``to_timestamp``: under ANSI mode
    (Spark 4 default) a plain cast THROWS on a malformed timestamp
    string, killing the whole stream on one bad record; try_ yields
    null so the policy filter drops it (pinned by
    tests/test_kafka_gating.py::test_kafka_parse_path_parity...).
    """
    return (
        raw.select(F.col(value_col).cast("string").alias("json"))
        .select(F.from_json("json", ENERGY_WIRE_SCHEMA).alias("data"))
        .select("data.*")
        .withColumn("timestamp", F.try_to_timestamp("timestamp"))
        .filter(F.col("timestamp").isNotNull())
    )


def kafka_energy_source(
    spark: SparkSession,
    bootstrap_servers: str = "localhost:9092",
    topic: str = "energy_stream",
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 100_000,
) -> DataFrame:
    """Kafka streaming source (reference app/app3_ML.py:79-86).

    ``maxOffsetsPerTrigger`` bounds per-batch work so one slow trigger
    can't snowball; the reference caps at 1000 (app/app3_ML.py:85), we
    default 100x higher — per-partition Kafka reads parallelize across
    executors. Requires the spark-sql-kafka package on the classpath;
    raises AnalysisException at .load() if absent.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return parse_energy_json(reader.load())


def file_replay_source(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int = 1
) -> DataFrame:
    """Deterministic replay: read parquet files as a stream, one file
    per trigger — pins trigger boundaries so stateful-operator tests are
    reproducible (SURVEY.md §7 hard-part 5)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
