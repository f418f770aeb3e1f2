"""Approximate-operator accuracy bounds (SURVEY.md §2.2 NO-ORACLE rows):
HLL distinct counts within ±5% of exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.io import load_table
from real_time_data_anomaly_detection_spark.operators import REGISTRY
from tests.conftest import SF_DIR


def test_approx_count_distinct_within_5pct(spark):
    approx = {
        r.event_type: r.approx_users
        for r in REGISTRY["q_approx_distinct"].spark_fn(spark, SF_DIR).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(0.05 * n, 1), (k, approx[k], n)


def test_approx_percentile_query_within_rank_window(spark):
    """q_approx_percentile lands inside the ±2%-rank window of each
    group's exact order statistics (the sketch returns an actual data
    value, so a rank bound — not a value bound — is the contract;
    interpolating exact percentile can sit between sparse tail
    values)."""
    approx = {
        r.event_type: (r.p50, r.p95)
        for r in REGISTRY["q_approx_percentile"].spark_fn(spark, SF_DIR).collect()
    }
    groups = {}
    for r in load_table(spark, SF_DIR, "events").select("event_type", "value").collect():
        groups.setdefault(r.event_type, []).append(r.value)
    assert set(approx) == set(groups)
    for k, vals in groups.items():
        vals.sort()
        n = len(vals)
        for got, q in zip(approx[k], (0.5, 0.95)):
            window = vals[max(0, int((q - 0.02) * n)) : min(n, int((q + 0.02) * n) + 1)]
            assert window[0] - 1e-6 <= got <= window[-1] + 1e-6, (k, q, got, window[0], window[-1])


def test_approx_quantiles_near_exact(spark):
    ev = load_table(spark, SF_DIR, "events")
    lo, med, hi = ev.approxQuantile("value", [0.1, 0.5, 0.9], 0.01)
    rows = sorted(r.value for r in ev.select("value").collect())
    n = len(rows)
    for got, q in ((lo, 0.1), (med, 0.5), (hi, 0.9)):
        want = rows[int(q * n)]
        # within 2% rank error of the exact quantile value neighborhood
        window = rows[max(0, int((q - 0.02) * n)) : int((q + 0.02) * n) + 1]
        assert window[0] <= got <= window[-1], (q, got, window[0], window[-1])
