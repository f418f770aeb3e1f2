"""Distributed logistic-regression text classifier over hashed
bag-of-words features — the fasttext-style quality/domain filter every
LLM curation pipeline trains on weak labels (wiki-vs-crawl,
high-vs-low quality) and applies corpus-wide.

Training is full-batch gradient descent with the SAME division of
labor as ``operators.clustering.kmeans_fit``: each iteration is one
Arrow-batched scan emitting a D+2-sized partial (gradient sums, loss,
count) per partition — CONSTANT in corpus size — and the driver sums
partials and takes the step. Nothing corpus-sized ever reaches the
driver; the weight vector ships to tasks as a closure constant (D
doubles, kilobytes at D=2^12). Scoring is one stateless Arrow pass,
so the same code path runs in batch or inside a Structured Streaming
query (same argument as streaming/anomaly.py's centroid scorer).

Feature hashing stays JVM-side: token -> ``pmod(xxhash64(token), D)``
index arrays, so Python only ever scatter-adds integer indices.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def featurize_hashed(
    df: DataFrame, text_col: str = "text", dim: int = 4096, out_col: str = "fidx"
) -> DataFrame:
    """Add ``out_col``: array of hashed feature indices (one per
    token, duplicates = counts). JVM-side, zero shuffle."""
    return df.withColumn(
        out_col,
        F.transform(
            F.split(F.col(text_col), " "),
            lambda t: F.pmod(F.xxhash64(t), F.lit(dim)).cast("int"),
        ),
    )


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def _batch_logits(
    fidx_values, w: np.ndarray, b: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-row logits from index arrays; returns (z, flat_idx, row_of)
    so the gradient pass can reuse the flattening."""
    lens = np.fromiter((len(v) for v in fidx_values), dtype=np.int64)
    flat = (
        np.concatenate([np.asarray(v, dtype=np.int64) for v in fidx_values])
        if lens.sum()
        else np.empty(0, dtype=np.int64)
    )
    row_of = np.repeat(np.arange(len(lens)), lens)
    z = np.bincount(row_of, weights=w[flat], minlength=len(lens)) + b
    return z, flat, row_of


def logreg_fit(
    df: DataFrame,
    label_col: str,
    fidx_col: str = "fidx",
    dim: int = 4096,
    n_iters: int = 30,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> tuple[np.ndarray, float, list[float]]:
    """Fit w (dim), b by full-batch GD; returns (w, b, loss_history).
    ``label_col`` must be 0/1 ints. Loss history is the mean logistic
    loss under the weights each iteration STARTED with."""
    data = df.select(
        F.col(fidx_col).alias("_f"), F.col(label_col).cast("double").alias("_y")
    )
    w = np.zeros(dim)
    b = 0.0
    history: list[float] = []

    for _ in range(n_iters):
        W, B = w, b  # closure constants for this iteration

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            g = np.zeros(dim)
            gb = 0.0
            loss = 0.0
            n = 0
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                y = pdf["_y"].to_numpy()
                z, flat, row_of = _batch_logits(pdf["_f"].to_numpy(), W, B)
                p = _sigmoid(z)
                # stable logistic loss: log(1+e^-|z|) + max(z,0) - z*y
                loss += float(
                    np.sum(np.log1p(np.exp(-np.abs(z))) + np.maximum(z, 0) - z * y)
                )
                r = p - y
                np.add.at(g, flat, r[row_of])
                gb += float(r.sum())
                n += len(y)
            yield pd.DataFrame(
                {"g": [g.tolist()], "gb": [gb], "loss": [loss], "n": [n]}
            )

        rows = data.mapInPandas(
            partials, "g array<double>, gb double, loss double, n long"
        ).collect()
        n = sum(r["n"] for r in rows)
        if n == 0:
            raise ValueError("empty input")
        g = np.sum([np.asarray(r["g"]) for r in rows], axis=0) / n + l2 * w
        gb = sum(r["gb"] for r in rows) / n
        history.append(sum(r["loss"] for r in rows) / n)
        w = w - lr * g
        b = b - lr * gb
    return w, b, history


def logreg_score(
    df: DataFrame,
    w: np.ndarray,
    b: float,
    fidx_col: str = "fidx",
    out_col: str = "p",
) -> DataFrame:
    """Add ``out_col``: P(y=1) per row. One stateless Arrow pass —
    batch and streaming share it."""
    W = np.asarray(w, dtype=np.float64)
    B = float(b)
    cols = df.columns
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            z, _, _ = _batch_logits(pdf[fidx_col].to_numpy(), W, B)
            out = pdf[cols].copy()
            out[out_col] = _sigmoid(z)
            yield out

    return df.mapInPandas(score, f"{fields}, {out_col} double")
