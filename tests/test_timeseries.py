"""Regular-grid resampling + forward fill."""

from __future__ import annotations

import datetime

from real_time_data_anomaly_detection_spark.operators.timeseries import resample_ffill


def test_resample_fills_gaps_and_keeps_measured_values(spark):
    t = lambda h, m=0: datetime.datetime(2024, 1, 1, h, m)  # noqa: E731
    rows = [
        ("a", t(0, 10), 10.0),
        ("a", t(0, 50), 20.0),   # hour 0 avg = 15
        # hour 1 and 2: GAP
        ("a", t(3, 5), 40.0),    # hour 3 avg = 40
        ("b", t(5, 0), 7.0),     # single-hour key: no gaps
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {
        (r.k, r.slot.hour): (r.avg_value, r.avg_value_ffill)
        for r in resample_ffill(df, "k", "ts", "value").collect()
    }
    assert out[("a", 0)] == (15.0, 15.0)   # measured
    assert out[("a", 1)] == (None, 15.0)   # gap: reported null, repaired 15
    assert out[("a", 2)] == (None, 15.0)
    assert out[("a", 3)] == (40.0, 40.0)
    assert out[("b", 5)] == (7.0, 7.0)
    assert len(out) == 5  # grid is per-key bounded, no cross-key bleed
