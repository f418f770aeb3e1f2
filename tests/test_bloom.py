"""Bloom-prefiltered semi-join: exactness, no-false-negative
guarantee, FP-rate bound, and the degenerate cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_semi_join,
)


def _big(spark, n=2000):
    return spark.range(n).select(
        (F.col("id") * 3).alias("k"), (F.col("id") % 7).alias("v")
    )


def _small(spark):
    # multiples of 30 up to 600: 21 keys, all present in big (k = 3*id)
    return spark.range(21).select((F.col("id") * 30).alias("k"))


def test_equals_plain_semi_join(spark):
    big, small = _big(spark), _small(spark)
    got = sorted(bloom_semi_join(big, small, "k").collect())
    want = sorted(big.join(small, "k", "left_semi").collect())
    assert got == want and len(got) == 21


def test_no_false_negatives_even_when_saturated(spark):
    # A deliberately tiny filter (128 bits, 500 keys) saturates the
    # bitmap — membership must STILL be true for every inserted key,
    # and every word (incl. bit 63 of each) gets exercised.
    keys = spark.range(500).select(F.col("id").alias("k"))
    words = bloom_build(keys, "k", num_bits=128, k=3)
    kept = keys.filter(bloom_might_contain(F.col("k"), words, 128, 3)).count()
    assert kept == 500


def test_fp_rate_bounded(spark):
    # 50 keys in a 2^14-bit filter with k=5: expected FP rate
    # (1-e^{-nk/m})^k ~ 1.5e-9; assert the measured rate over 10k
    # non-members stays below an ultra-conservative 1%.
    members = spark.range(50).select((F.col("id") + 1_000_000).alias("k"))
    words = bloom_build(members, "k", num_bits=1 << 14, k=5)
    probes = spark.range(10_000).select(F.col("id").alias("k"))
    fp = probes.filter(bloom_might_contain(F.col("k"), words, 1 << 14, 5)).count()
    assert fp <= 100


def test_bloom_actually_prunes(spark):
    # The point of the operator: rows failing the filter never reach
    # the join. With 21 true keys out of 2000, the pruned set must be
    # far smaller than the input (FPs allowed, but bounded).
    big, small = _big(spark), _small(spark)
    words = bloom_build(small, "k")
    pruned = big.filter(bloom_might_contain(F.col("k"), words, 1 << 17, 5))
    assert 21 <= pruned.count() < 200


def test_empty_small_side(spark):
    big = _big(spark)
    empty = spark.range(0).select(F.col("id").alias("k"))
    assert bloom_semi_join(big, empty, "k").count() == 0


def test_string_keys(spark):
    big = spark.createDataFrame(
        [(f"doc{i}",) for i in range(300)], "k string"
    )
    small = spark.createDataFrame([("doc7",), ("doc42",), ("nope",)], "k string")
    got = sorted(r.k for r in bloom_semi_join(big, small, "k").collect())
    assert got == ["doc42", "doc7"]


def test_bad_num_bits_rejected(spark):
    import pytest

    small = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(small, "k", num_bits=100)
