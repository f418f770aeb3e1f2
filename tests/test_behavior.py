"""Funnel / retention / regression semantics on constructed fixtures
(the oracle pins cross-engine equality; these pin the SEMANTICS)."""

from __future__ import annotations

from datetime import datetime

import pytest

from real_time_data_anomaly_detection_spark.operators.behavior import (
    funnel,
    retention_cohorts,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, datetime(2024, 1, d, h)) for u, t, d, h in rows],
        "user_id long, event_type string, ts timestamp_ntz",
    )


def test_funnel_order_semantics(spark):
    ev = _ev(
        spark,
        [
            # user 1 converts fully in order
            (1, "view", 1, 0), (1, "click", 1, 1), (1, "purchase", 1, 2),
            # user 2: purchase BEFORE click -> counts for click, not purchase
            (2, "view", 1, 0), (2, "purchase", 1, 1), (2, "click", 1, 2),
            # user 3: click with no prior view -> counts for view only via none
            (3, "click", 1, 0),
            # user 4: view only
            (4, "view", 1, 0),
        ],
    )
    got = {r.stage: r.n_users for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_monotone_on_fixture(spark):
    ev = _ev(
        spark,
        [(u, t, 1 + (u % 20), (u * 7 + i) % 24)
         for u in range(40)
         for i, t in enumerate(["view", "click", "purchase", "view", "click"])],
    )
    ns = [r.n_users for r in funnel(ev, ["view", "click", "purchase"]).collect()]
    assert ns == sorted(ns, reverse=True)


def test_retention_week0_and_later(spark):
    ev = _ev(
        spark,
        [
            (1, "signup", 1, 0),          # Mon Jan 1 cohort
            (1, "click", 10, 0),          # Jan 10 -> week 1
            (1, "view", 16, 0),           # Jan 16 -> week 2
            (2, "signup", 2, 0),          # same cohort week
            (3, "click", 1, 0),           # never signed up -> excluded
        ],
    )
    got = {(str(r.cohort_week), r.week_n): r.n_users
           for r in retention_cohorts(ev).collect()}
    # both signups active in week 0 (the signup event itself)
    assert got[("2024-01-01", 0)] == 2
    assert got[("2024-01-01", 1)] == 1
    assert got[("2024-01-01", 2)] == 1
    assert len(got) == 3


def test_regression_exact_line(spark):
    import __spark_entry__  # noqa: F401  (registry import)
    from pyspark.sql import functions as F

    # y = 3x + 5 exactly -> slope 3, intercept 5, r2 = 1
    d = spark.range(100).select(
        F.lit("g").alias("event_type"),
        (F.col("id") * 3 + 5).cast("double").alias("y"),
        F.col("id").cast("double").alias("x"),
    )
    row = (
        d.groupBy("event_type")
        .agg(
            F.round(F.regr_slope("y", "x"), 4).alias("s"),
            F.round(F.regr_intercept("y", "x"), 4).alias("i"),
            F.round(F.regr_r2("y", "x"), 4).alias("r2"),
        )
        .collect()[0]
    )
    assert (row.s, row.i, row.r2) == (3.0, 5.0, 1.0)


def test_sessionize_known_boundaries(spark):
    """Hand-built stream with known 30-min-gap sessions: boundary gap
    EXACTLY 30 min stays in-session (rule is strictly-greater), 30 min
    + 1 µs splits; singleton sessions get duration 0."""
    import datetime as dt

    from real_time_data_anomaly_detection_spark.operators.behavior import sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m, us = dt.timedelta(minutes=1), dt.timedelta(microseconds=1)
    rows = [
        # user 1, session 1: three events, gaps 10 min and EXACTLY 30 min
        (1, t0, 1),
        (1, t0 + 10 * m, 2),
        (1, t0 + 40 * m, 3),
        # user 1, session 2: 30 min + 1 µs after the last event
        (1, t0 + 70 * m + us, 4),
        # user 2: one lonely event
        (2, t0, 5),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, event_id long")
    got = {
        (r.user_id, r.session_id): (r.session_start, r.n_events, r.duration_s)
        for r in sessionize(df).collect()
    }
    assert got == {
        (1, 1): (t0, 3, 2400),          # 40 min span, whole seconds
        (1, 2): (t0 + 70 * m + us, 1, 0),
        (2, 1): (t0, 1, 0),
    }
