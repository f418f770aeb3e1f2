"""Count-Min and HLL sketch operators: guarantee bounds, accuracy,
and partition invariance (the oracle twin pins cross-engine algebra;
these pin the sketch THEORY holds on the implementation)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.operators.sketch import (
    countmin_build,
    countmin_estimate,
    hll_estimate,
)


def _zipf_items(spark):
    # item i appears (50 - i) times, i = 0..49 — known exact counts
    rows = [(f"item{i}",) for i in range(50) for _ in range(50 - i)]
    return spark.createDataFrame(rows, "item string")


def test_cms_never_underestimates(spark):
    items = _zipf_items(spark)
    exact = {r.item: r.n for r in items.groupBy("item").agg(F.count("*").alias("n")).collect()}
    sk = countmin_build(items, "item", depth=4, width=32)  # tiny: force collisions
    probes = items.select("item").distinct()
    est = {r.item: r.cms_est for r in countmin_estimate(sk, probes, "item", depth=4, width=32).collect()}
    assert est.keys() == exact.keys()
    assert all(est[k] >= exact[k] for k in exact)


def test_cms_exact_when_wide(spark):
    # width 4096 for 50 items: P(any collision in a row) is tiny, and
    # the min over 4 independent rows needs EVERY row to collide on
    # the same item to overestimate — exact equality expected.
    items = _zipf_items(spark)
    exact = {r.item: r.n for r in items.groupBy("item").agg(F.count("*").alias("n")).collect()}
    sk = countmin_build(items, "item", depth=4, width=4096)
    probes = items.select("item").distinct()
    est = {r.item: r.cms_est for r in countmin_estimate(sk, probes, "item", depth=4, width=4096).collect()}
    assert est == exact


def test_cms_absent_item_estimates_zero_or_collision(spark):
    items = _zipf_items(spark)
    sk = countmin_build(items, "item", depth=4, width=4096)
    probes = spark.createDataFrame([("never-seen",)], "item string")
    est = countmin_estimate(sk, probes, "item", depth=4, width=4096).collect()
    assert est[0].cms_est == 0


def test_cms_partition_invariance(spark):
    items = _zipf_items(spark)
    probes = items.select("item").distinct()

    def run(df):
        sk = countmin_build(df, "item", depth=4, width=64)
        return sorted(
            (r.item, r.cms_est)
            for r in countmin_estimate(sk, probes, "item", depth=4, width=64).collect()
        )

    assert run(items.repartition(1)) == run(items.repartition(13))


def test_hll_error_within_bound(spark):
    # 2000 distinct keys, m=64 registers: standard error 1.04/8 = 13%;
    # allow 3 sigma.
    df = spark.range(2000).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    est = hll_estimate(df, "k", ["g"], p=6).collect()[0].hll_est
    assert est == pytest.approx(2000, rel=0.39)


def test_hll_linear_counting_small_range(spark):
    # 10 distinct with 64 registers lands in the linear-counting
    # branch: near-exact.
    df = spark.range(10).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    est = hll_estimate(df, "k", ["g"], p=6).collect()[0].hll_est
    assert est == pytest.approx(10, abs=3)


def test_hll_duplicates_do_not_move_estimate(spark):
    # Cardinality sketch: 2000 distinct keys x 5 copies == 1 copy.
    once = spark.range(2000).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    five = once.crossJoin(spark.range(5)).select("g", "k")
    a = hll_estimate(once, "k", ["g"], p=6).collect()[0].hll_est
    b = hll_estimate(five, "k", ["g"], p=6).collect()[0].hll_est
    assert a == b


def test_hll_per_group_independent(spark):
    df = spark.range(1000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        # group "0": 500 distinct; group "1": the same 50 keys repeated
        F.when(F.col("id") % 2 == 0, F.col("id")).otherwise(F.col("id") % 100).alias("k"),
    )
    got = {r.g: r.hll_est for r in hll_estimate(df, "k", ["g"], p=6).collect()}
    assert got["0"] == pytest.approx(500, rel=0.4)
    assert got["1"] == pytest.approx(50, rel=0.4)
