"""Regular-grid resampling + forward fill."""

from __future__ import annotations

import datetime

import pytest

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


def test_resample_multi_unit_interval_keeps_observed_data(spark):
    # Regression: '15 minutes' used to bucket actuals by date_trunc
    # ('minute') while the grid stepped 15 min from the truncated min,
    # so almost every observation missed its grid slot and was
    # reported as a gap. The grid anchors at the per-key minute-
    # truncated min, NOT at clock-aligned quarter hours.
    t = lambda h, m, s=0: datetime.datetime(2024, 1, 1, h, m, s)  # noqa: E731
    rows = [
        ("a", t(0, 7), 10.0),    # anchor t0 = 00:07
        ("a", t(0, 14), 20.0),   # same slot [00:07, 00:22) -> avg 15
        ("a", t(0, 30), 30.0),   # slot [00:22, 00:37)
        # slot [00:37, 00:52): GAP
        ("a", t(1, 0), 50.0),    # slot [00:52, 01:07)
        ("b", t(2, 1, 30), 9.0),  # single-slot key, sub-minute offset
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {
        (r.k, r.slot.strftime("%H:%M")): (r.avg_value, r.avg_value_ffill)
        for r in resample_ffill(df, "k", "ts", "value", "15 minutes").collect()
    }
    assert out[("a", "00:07")] == (15.0, 15.0)
    assert out[("a", "00:22")] == (30.0, 30.0)
    assert out[("a", "00:37")] == (None, 30.0)  # true gap, repaired
    assert out[("a", "00:52")] == (50.0, 50.0)
    assert out[("b", "02:01")] == (9.0, 9.0)
    assert len(out) == 5
    # Every observation landed in some slot: no measured data dropped.
    measured = [v for v, _ in out.values() if v is not None]
    assert len(measured) == 4


def test_resample_rejects_multi_unit_calendar_interval(spark):
    import pytest

    df = spark.createDataFrame(
        [("a", datetime.datetime(2024, 1, 1), 1.0)],
        "k string, ts timestamp, value double",
    )
    with pytest.raises(ValueError, match="variable-width"):
        resample_ffill(df, "k", "ts", "value", "3 months")


def test_anomaly_mad_threshold_robust_to_outliers(spark):
    """The MAD threshold must not move when extreme outliers are
    injected (the property that distinguishes it from the stddev
    z-score)."""
    from pyspark.sql import functions as F

    from real_time_data_anomaly_detection_spark.operators.registry import REGISTRY  # noqa: F401
    import real_time_data_anomaly_detection_spark.operators.timeseries as ts

    base = [("a", float(v)) for v in range(1, 100)]  # median 50, MAD 25
    spiked = base + [("a", 1e9), ("a", -1e9)]
    d1 = spark.createDataFrame(base, "event_type string, value double")
    d2 = spark.createDataFrame(spiked, "event_type string, value double")

    def run(d):
        med = d.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
        dev = d.join(F.broadcast(med), "event_type").select(
            "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
        )
        mad = dev.groupBy("event_type").agg(F.expr("percentile(ad, 0.5)").alias("mad"))
        return mad.collect()[0].mad

    assert run(d1) == 25.0
    assert run(d2) == 25.0  # two spikes in 101 rows cannot move the MAD


def test_ewma_matches_pandas_adjusted(spark):
    """ewma() must reproduce pandas ewm(alpha, adjust=True).mean() per
    key — the definition the docstring claims — including the first
    row (= raw value, no warm-up transient)."""
    import pandas as pd

    from real_time_data_anomaly_detection_spark.operators.timeseries import ewma

    vals = {
        "a": [10.0, 12.0, 9.0, 20.0, 15.0, 14.0, 30.0],
        "b": [5.0, 5.0, 8.0],
    }
    rows = [(k, i, v) for k, series in vals.items() for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    out = {
        (r.k, r.t): r.ewma
        for r in ewma(df, "k", "t", "v", alpha=0.3).collect()
    }
    for k, series in vals.items():
        expect = pd.Series(series).ewm(alpha=0.3, adjust=True).mean()
        for i, e in enumerate(expect):
            assert out[(k, i)] == pytest.approx(e, rel=1e-12), (k, i)


def test_exact_mean_4dp_half_boundary(spark):
    """The half-boundary cell that round(double, 4) got wrong
    cross-engine: mean exactly 38.37875 must round half-up to 38.3788
    — in pure integer arithmetic, regardless of engine round()
    behavior. Also: a just-below-boundary mean must round down."""
    from pyspark.sql import functions as F

    from real_time_data_anomaly_detection_spark.operators.timeseries import (
        _exact_mean_4dp,
    )

    rows = [
        (307030000, 8),  # 38.378750... exactly -> half-up 38.3788
        (307029999, 8),  # 38.37874987... -> 38.3787
        (100, 1),        # 0.0001 exactly
        (49, 1),         # 0.000049 -> rounds to 0.0000
        (50, 1),         # half boundary at the smallest unit -> 0.0001
    ]
    df = spark.createDataFrame(rows, "_sm long, _n long")
    got = [r.v for r in df.select(_exact_mean_4dp("_sm", "_n").alias("v")).collect()]
    assert got == [38.3788, 38.3787, 0.0001, 0.0, 0.0001]


def test_ohlc_bars_duplicate_timestamp_tiebreak(spark):
    """Two ticks sharing (key, bar, ts) must yield deterministic
    open/close: the window orders by (ts, v_u), so the smaller value
    opens and the larger closes when timestamps collide (VERDICT r7
    What's-wrong #2 — the cdc_apply tiebreak discipline applied
    here)."""
    import datetime

    from real_time_data_anomaly_detection_spark.operators.timeseries import (
        ohlc_bars,
    )

    t0 = datetime.datetime(2024, 1, 1, 0, 1, 0)
    t1 = datetime.datetime(2024, 1, 1, 0, 2, 0)
    rows = [
        # duplicate-ts pair inside one 900s bar, out of insertion order
        ("a", t0, 7.0),
        ("a", t0, 3.0),
        # duplicate pair AT the max ts: close must be the larger v_u
        ("a", t1, 5.0),
        ("a", t1, 4.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    [bar] = ohlc_bars(df, "k", "ts", "value", 900).collect()
    u = 1048576
    assert bar.open_u == 3 * u      # min v_u among the earliest-ts ties
    assert bar.close_u == 5 * u     # max v_u among the latest-ts ties
    assert bar.high_u == 7 * u
    assert bar.low_u == 3 * u
    assert bar.n_ticks == 4
    assert bar.sum_u == (7 + 3 + 5 + 4) * u


def test_exact_group_quantile_two_level_matches_naive_and_handles_negatives(spark):
    """exact_group_quantile (two-level bucket selection) must equal
    the naive global rank definition on a fixture WITH NEGATIVE
    values (floor-bucketing, not div-truncation), and its rank
    window must partition by (key, _b) — never a whole key in one
    task."""
    from real_time_data_anomaly_detection_spark.operators.timeseries import (
        exact_group_quantile,
    )
    from real_time_data_anomaly_detection_spark.plans.inspect import (
        formatted_plan,
    )

    rows = []
    for k in ("a", "b"):
        for i in range(2000):
            # deterministic spread straddling zero, with ties
            v = ((i * 37) % 401) - 200
            rows.append((k, i, v * 1_000_000))
    df = spark.createDataFrame(rows, "key string, rid long, xm long")
    for q in (50, 95, 99):
        got = {
            (r.key): r.q_value
            for r in exact_group_quantile(df, "key", "xm", "rid", q).collect()
        }
        import collections

        vals = collections.defaultdict(list)
        for k, rid, xm in rows:
            vals[k].append((xm, rid))
        want = {}
        for k, vs in vals.items():
            vs.sort()
            want[k] = vs[(q * (len(vs) - 1)) // 100][0]
        assert got == want, q
    plan = formatted_plan(exact_group_quantile(df, "key", "xm", "rid", 95))
    assert "_b" in plan


def test_exact_group_quantiles_matches_single_q(spark):
    """The one-pass multi-quantile selection returns, for every
    requested q, exactly the single-q two-level selection's value —
    and both match a driver-side sorted-rank reference — on random
    keyed data including heavy ties."""
    import numpy as np

    from real_time_data_anomaly_detection_spark.operators.timeseries import (
        exact_group_quantile,
        exact_group_quantiles,
    )

    rng = np.random.RandomState(17)
    rows = [
        (f"k{rng.randint(3)}", int(rng.randint(0, 40)), i)  # heavy ties
        for i in range(500)
    ] + [("k9", 7, 10_000)]  # single-row group: every q = the value
    df = spark.createDataFrame(rows, "key string, xm long, rid long")
    qs = (10, 25, 50, 75, 95)
    multi = {
        (r.key, r.q_pct): r.q_value
        for r in exact_group_quantiles(df, "key", "xm", "rid", qs).collect()
    }
    by_key: dict = {}
    for k, x, r in rows:
        by_key.setdefault(k, []).append((x, r))
    for k, vals in by_key.items():
        vals.sort()
        n = len(vals)
        for q in qs:
            want = vals[(q * (n - 1)) // 100][0]
            assert multi[(k, q)] == want, (k, q)
    for q in (25, 95):
        single = {
            r.key: r.q_value
            for r in exact_group_quantile(df, "key", "xm", "rid", q).collect()
        }
        for k in by_key:
            assert single[k] == multi[(k, q)], (k, q)


def test_emd_publish_long_division_identity(spark):
    """Round-11 review #2 pin: _emd_u_expr's base-2^10 long division
    equals floor(num*2^20/den) EXACTLY, at magnitudes the naive
    single multiply could not represent (num*2^20 > 10^38) — checked
    against Python bigints in Spark AND against the shared DuckDB
    oracle fragment, across the whole usable range including num=den
    (full separation -> exactly 2^20), num=0, and den=0 -> 0."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    from real_time_data_anomaly_detection_spark.operators.timeseries import (
        _EMD_U_SQL,
        _emd_u_expr,
    )

    rng = random.Random(11)
    cases = [(0, 0), (0, 7), (5, 5), (1, 10**34)]
    for mag in (10**6, 10**12, 10**20, 10**28, 10**34):
        for _ in range(6):
            den = rng.randrange(1, mag)
            cases.append((rng.randrange(0, den + 1), den))
    want = [
        0 if d == 0 else (n * 1048576) // d for n, d in cases
    ]
    # Overflow-range den: n1*n2*range >= 1e38 nulls the decimal(38,0)
    # product under non-ANSI mode; the publication must propagate
    # NULL (loud unknown), never the silent 0 the pre-round-12
    # .otherwise(0) produced (ADVICE r11 #1).
    cases.append((10**30, None))
    want.append(None)

    rows = [
        (i, str(n), None if d is None else str(d))
        for i, (n, d) in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, "i long, n string, d string").select(
        "i",
        F.col("n").cast("decimal(38,0)").alias("_num"),
        F.col("d").cast("decimal(38,0)").alias("_den"),
    )
    got = {
        r.i: r.u
        for r in df.select("i", _emd_u_expr("_num", "_den").alias("u"))
        .collect()
    }
    assert [got[i] for i in range(len(cases))] == want

    con = duckdb.connect()
    frag = _EMD_U_SQL.format(n="n", d="d")
    duck = [
        con.execute(
            f"SELECT {frag} FROM (SELECT CAST(? AS HUGEINT) n,"
            " CAST(? AS HUGEINT) d)",
            [str(n), None if d is None else str(d)],
        ).fetchone()[0]
        for n, d in cases
    ]
    assert duck == want


def test_holt_smooth_survives_all_null_slot(spark):
    """ADVICE r11 #2: a (key, slot) group whose values are all NULL
    used to deliver NaN to the pandas fit and math.floor(NaN) killed
    the whole applyInPandas stage. Null measurements are now dropped
    before the per-slot aggregation: the all-null slot degrades to
    "slot absent" and the remaining series still fits; a key left
    with < 2 slots emits nothing instead of crashing."""
    from real_time_data_anomaly_detection_spark.operators.timeseries import (
        holt_smooth,
    )

    df = spark.createDataFrame(
        [
            ("a", 1, 100), ("a", 2, None), ("a", 3, 90), ("a", 4, 130),
            ("b", 1, None), ("b", 2, None),
        ],
        "event_type string, slot long, xm long",
    )
    rows = holt_smooth(df, "event_type", "slot", "xm").collect()
    assert [r.event_type for r in rows] == ["a"]
    clean = spark.createDataFrame(
        [("a", 1, 100), ("a", 3, 90), ("a", 4, 130)],
        "event_type string, slot long, xm long",
    )
    want = holt_smooth(clean, "event_type", "slot", "xm").collect()[0]
    got = rows[0]
    assert (got.n_slots, got.level_i, got.trend_u, got.forecast_i) == (
        want.n_slots, want.level_i, want.trend_u, want.forecast_i
    )
