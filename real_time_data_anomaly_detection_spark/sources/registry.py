"""Format-agnostic batch/streaming source and sink entry points.

A thin, uniform veneer over ``spark.read`` / ``readStream`` /
``write`` so pipelines name a format + options instead of hand-rolling
reader chains. Everything stays a native DataSource scan — Catalyst
pushdown/pruning applies unchanged.

Batch formats: parquet, csv, json, orc, text.
Streaming formats: kafka (via streaming.source), rate, file-replay
(parquet dir), socket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

BATCH_FORMATS = ("parquet", "csv", "json", "orc", "text")


def read_batch(
    spark: SparkSession,
    fmt: str,
    path: str,
    schema=None,
    **options,
) -> DataFrame:
    """Batch read. CSV/JSON default to an explicit schema when given —
    schema inference is a full extra pass over the data (never at 100 TB)."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unknown batch format {fmt!r}; have {BATCH_FORMATS}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        # Always assume a header line (write_batch emits one); an
        # explicit schema alone would otherwise parse headers as data.
        reader = reader.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_stream(
    spark: SparkSession,
    fmt: str,
    schema=None,
    **options,
) -> DataFrame:
    """Streaming read: kafka | rate | file | socket.

    kafka: bootstrap_servers, topic (parsed energy rows — see
    streaming.source.kafka_energy_source for the full contract).
    file: path + schema required; one file per trigger by default for
    deterministic replay.
    """
    if fmt == "kafka":
        from real_time_data_anomaly_detection_spark.streaming.source import (
            kafka_energy_source,
        )

        return kafka_energy_source(
            spark,
            bootstrap_servers=options.pop("bootstrap_servers", "localhost:9092"),
            topic=options.pop("topic", "energy_stream"),
            **options,
        )
    if fmt == "rate":
        reader = spark.readStream.format("rate")
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load()
    if fmt == "file":
        from real_time_data_anomaly_detection_spark.streaming.source import (
            file_replay_source,
        )

        if schema is None or "path" not in options:
            raise ValueError("file stream needs schema= and path=")
        return file_replay_source(
            spark, options["path"], schema, options.get("max_files_per_trigger", 1)
        )
    if fmt == "socket":
        reader = spark.readStream.format("socket")
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load()
    raise ValueError(f"unknown stream format {fmt!r}")


def write_batch(df: DataFrame, fmt: str, path: str, mode: str = "overwrite", partition_by: list[str] | None = None, **options) -> None:
    """Batch write; ``partition_by`` sets the directory partitioning that
    downstream partition pruning keys on."""
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")  # read_batch assumes it
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
