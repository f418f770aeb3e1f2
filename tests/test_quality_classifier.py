"""Distributed logistic regression (hashed bag-of-words): learning on
separable data, exact numpy-GD parity, partition invariance, and
streaming==batch scoring."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import finish

from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.functions.quality_classifier import (
    _sigmoid,
    featurize_hashed,
    logreg_fit,
    logreg_score,
)

DIM = 64


def _corpus(spark, n_per=60, seed=0):
    """Separable two-class corpus: class 1 draws from an A-vocabulary,
    class 0 from a B-vocabulary, with a little shared filler."""
    rng = np.random.RandomState(seed)
    a_vocab = [f"good{i}" for i in range(12)]
    b_vocab = [f"bad{i}" for i in range(12)]
    filler = [f"any{i}" for i in range(6)]
    rows = []
    for i in range(n_per):
        rows.append(
            (i, " ".join(rng.choice(a_vocab + filler, 12)), 1)
        )
        rows.append(
            (n_per + i, " ".join(rng.choice(b_vocab + filler, 12)), 0)
        )
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def test_logreg_learns_separable_corpus(spark):
    df = featurize_hashed(_corpus(spark), dim=DIM)
    w, b, hist = logreg_fit(df, "y", dim=DIM, n_iters=25)
    assert hist[-1] < hist[0] * 0.5, hist
    scored = logreg_score(df, w, b)
    got = scored.select("y", (F.col("p") > 0.5).cast("int").alias("pred")).collect()
    acc = sum(r.y == r.pred for r in got) / len(got)
    assert acc >= 0.95, acc


def test_logreg_matches_numpy_gd_and_partition_count(spark):
    """The distributed iteration IS full-batch GD: a single-node numpy
    loop over the same hashed features lands on the same weights, and
    the fit is invariant to input partitioning (up to partial-sum
    float noise)."""
    base = _corpus(spark, n_per=30, seed=1)
    feats = featurize_hashed(base, dim=DIM)
    rows = feats.select("fidx", "y").orderBy("doc_id").collect()
    idx = [np.asarray(r.fidx) for r in rows]
    y = np.array([r.y for r in rows], dtype=float)

    # reference GD, same lr/l2/iters as logreg_fit defaults
    w_ref, b_ref = np.zeros(DIM), 0.0
    lr, l2, iters = 0.5, 1e-4, 10
    for _ in range(iters):
        z = np.array([w_ref[v].sum() for v in idx]) + b_ref
        p = _sigmoid(z)
        g = np.zeros(DIM)
        for v, r in zip(idx, p - y):
            np.add.at(g, v, r)
        w_ref = w_ref - lr * (g / len(y) + l2 * w_ref)
        b_ref = b_ref - lr * float((p - y).mean())

    for parts in (1, 7):
        w, b, _ = logreg_fit(
            feats.repartition(parts), "y", dim=DIM, n_iters=iters
        )
        assert np.allclose(w, w_ref, atol=1e-8), np.abs(w - w_ref).max()
        assert abs(b - b_ref) < 1e-8


def test_logreg_score_stream_equals_batch(spark, tmp_path):
    """Scoring is stateless per row: the same weights through a
    Structured Streaming file replay emit identical probabilities."""
    df = featurize_hashed(_corpus(spark, n_per=20, seed=2), dim=DIM)
    w, b, _ = logreg_fit(df, "y", dim=DIM, n_iters=8)
    batch = {
        r.doc_id: round(r.p, 9) for r in logreg_score(df, w, b).collect()
    }

    sdir = str(tmp_path / "clf_stream")
    plain = df.drop("fidx")
    plain.write.parquet(sdir)
    stream = featurize_hashed(
        spark.readStream.schema(plain.schema).parquet(sdir), dim=DIM
    )
    q = (
        logreg_score(stream, w, b)
        .writeStream.format("memory")
        .queryName("clf_scores")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    finish(q)
    streamed = {
        r.doc_id: round(r.p, 9) for r in spark.table("clf_scores").collect()
    }
    assert streamed == batch


def test_logreg_empty_input_raises(spark):
    df = featurize_hashed(
        spark.createDataFrame([], "doc_id long, text string, y int"), dim=DIM
    )
    with pytest.raises(ValueError, match="empty input"):
        logreg_fit(df, "y", dim=DIM, n_iters=1)
