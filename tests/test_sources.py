"""Connector registry round-trips: every batch format writes and reads
back losslessly (or documented-lossy for text)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.sources import (
    read_batch,
    read_stream,
    write_batch,
)


@pytest.fixture(scope="module")
def sample(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, None, None)],
        "id long, s string, v double",
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(fmt, spark, sample, tmp_path):
    path = str(tmp_path / fmt)
    write_batch(sample, fmt, path)
    back = read_batch(spark, fmt, path, schema=sample.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, sample.collect()))


def test_partitioned_write_prunes(spark, sample, tmp_path):
    path = str(tmp_path / "part")
    write_batch(sample, "parquet", path, partition_by=["s"])
    back = read_batch(spark, "parquet", path).filter(F.col("s") == "a")
    # partition pruning: only the s=a directory is scanned
    assert back.count() == 1
    scan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in scan


def test_unknown_formats_rejected(spark):
    with pytest.raises(ValueError):
        read_batch(spark, "avro-nope", "/tmp/x")
    with pytest.raises(ValueError):
        read_stream(spark, "nope")


def test_rate_stream_constructs(spark):
    df = read_stream(spark, "rate", rowsPerSecond=5)
    assert df.isStreaming
    assert set(df.columns) == {"timestamp", "value"}


def test_corpus_cache_path_staleness(tmp_path):
    """The shared /tmp cache-path helper fingerprints the CORPUS, not
    the directory name: same path + rewritten data → different cache
    dir; identical data → stable dir; different prefixes never
    collide."""
    import os
    import time

    from real_time_data_anomaly_detection_spark.io import corpus_cache_path

    d = tmp_path / "documents.parquet"
    d.mkdir()
    f = d / "part-0.parquet"
    f.write_bytes(b"aaaa")
    p1 = corpus_cache_path(str(tmp_path), "documents", "textidx")
    p1b = corpus_cache_path(str(tmp_path), "documents", "textidx")
    assert p1 == p1b
    assert corpus_cache_path(str(tmp_path), "documents", "imgidx") != p1
    time.sleep(0.01)
    f.write_bytes(b"bbbbbb")  # size + mtime change
    os.utime(f)
    p2 = corpus_cache_path(str(tmp_path), "documents", "textidx")
    assert p2 != p1
