"""Hypothesis property tests over the pure-python kernels and the
as-of join (vs a brute-force reference implementation)."""

from __future__ import annotations

import datetime

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_data_anomaly_detection_spark.functions.iforest import IsolationForest

matrices = st.integers(60, 200).flatmap(
    lambda n: st.integers(1, 5).flatmap(
        lambda d: st.lists(
            st.lists(
                st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
                min_size=d,
                max_size=d,
            ),
            min_size=n,
            max_size=n,
        )
    )
)


@settings(max_examples=15, deadline=None)
@given(matrices)
def test_iforest_labels_and_contamination_bound(rows):
    X = np.array(rows)
    labels = IsolationForest(contamination=0.05, random_state=42).fit_predict(X)
    assert set(labels) <= {-1, 1}
    n_out = int((labels == -1).sum())
    # at most ~contamination·n flagged (+1 for the tie-forcing rule),
    # and at least one when data is non-constant
    assert n_out <= int(0.05 * len(X)) + 1
    if not np.allclose(X, X[0]):
        assert n_out >= 1


@settings(max_examples=15, deadline=None)
@given(matrices)
def test_iforest_scores_bounded_and_deterministic(rows):
    X = np.array(rows)
    m = IsolationForest(random_state=7).fit(X)
    s1, s2 = m.score_samples(X), m.score_samples(X)
    assert np.array_equal(s1, s2)
    assert (s1 > 0).all() and (s1 <= 1.0).all()


# --- as-of join vs brute force -------------------------------------------

events = st.lists(
    st.tuples(
        st.integers(0, 3),  # user
        st.integers(0, 10_000),  # seconds offset
        st.booleans(),  # left side?
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=10, deadline=None)
@given(events)
def test_asof_join_matches_bruteforce(spark, rows):
    from real_time_data_anomaly_detection_spark.operators.asof import asof_join

    base = datetime.datetime(2024, 1, 1)
    recs = [
        (i, u, base + datetime.timedelta(seconds=s), is_left)
        for i, (u, s, is_left) in enumerate(rows)
    ]
    left = [(i, u, ts) for i, u, ts, is_l in recs if is_l]
    right = [(i, u, ts) for i, u, ts, is_l in recs if not is_l]
    if not left or not right:
        return
    ldf = spark.createDataFrame(left, "event_id long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(right, "event_id long, user_id long, ts timestamp")
    got = {
        r.event_id: r.asof_event_id
        for r in asof_join(ldf, rdf, on="ts", by=["user_id"], value_cols=["event_id"]).collect()
    }
    for lid, lu, lts in left:
        cands = [(ts, i) for i, u, ts in right if u == lu and ts <= lts]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, (lid, got[lid], want)


def test_asof_join_null_value_col_not_stitched(spark):
    """A matched right row with a NULL value column must propagate AS A
    WHOLE (NULL included) — per-column last(ignorenulls) would stitch
    the NULL field from an older row, pairing values that never
    co-occurred."""
    import datetime

    from pyspark.sql import functions as F

    from real_time_data_anomaly_detection_spark.operators.asof import asof_join

    base = datetime.datetime(2024, 1, 1)
    ts = lambda s: base + datetime.timedelta(seconds=s)  # noqa: E731
    rdf = spark.createDataFrame(
        [(1, ts(1), 10, "x"), (1, ts(2), None, "y")],
        "user_id long, ts timestamp, a int, b string",
    )
    ldf = spark.createDataFrame([(99, 1, ts(3))], "event_id long, user_id long, ts timestamp")
    row = asof_join(
        ldf, rdf, on="ts", by=["user_id"], value_cols=["a", "b"]
    ).head()
    assert row.asof_b == "y" and row.asof_ts == ts(2)
    assert row.asof_a is None, "NULL a must come from the ts=2 row, not ts=1"
