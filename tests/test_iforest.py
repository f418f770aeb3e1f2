"""Unit tests for the pure-numpy IsolationForest."""

from __future__ import annotations

import numpy as np
import pytest

from real_time_data_anomaly_detection_spark.functions.iforest import IsolationForest


def _blob_with_outliers(n=500, n_out=25, seed=7):
    rng = np.random.default_rng(seed)
    inliers = rng.normal(0, 1, size=(n - n_out, 4))
    outliers = rng.uniform(8, 12, size=(n_out, 4)) * rng.choice([-1, 1], size=(n_out, 1))
    X = np.vstack([inliers, outliers])
    labels = np.r_[np.ones(n - n_out), -np.ones(n_out)]
    return X, labels


def test_detects_planted_outliers():
    X, truth = _blob_with_outliers()
    pred = IsolationForest(contamination=0.05, random_state=42).fit_predict(X)
    flagged = np.flatnonzero(pred == -1)
    # Every flagged point should be a planted outlier (precision 1.0 on
    # this easy geometry), and we flag ~5% of 500 = ~25 points.
    assert len(flagged) >= 20
    assert all(truth[i] == -1 for i in flagged)


def test_deterministic_under_seed():
    X, _ = _blob_with_outliers(seed=11)
    a = IsolationForest(random_state=42).fit(X).score_samples(X)
    b = IsolationForest(random_state=42).fit(X).score_samples(X)
    assert np.array_equal(a, b)
    c = IsolationForest(random_state=7).fit(X).score_samples(X)
    assert not np.array_equal(a, c)


def test_scores_in_unit_interval():
    X, _ = _blob_with_outliers()
    s = IsolationForest(random_state=42).fit(X).score_samples(X)
    assert (s > 0).all() and (s <= 1).all()
    # Outliers (last 25 rows) must score strictly higher on average.
    assert s[-25:].mean() > s[:-25].mean() + 0.1


def test_constant_data_no_crash():
    X = np.ones((100, 3))
    pred = IsolationForest(random_state=42).fit_predict(X)
    assert set(pred) <= {-1, 1}


def test_empty_raises():
    with pytest.raises(ValueError):
        IsolationForest().fit(np.empty((0, 4)))
