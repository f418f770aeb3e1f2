"""Distributed anomaly detection — the reference's core capability,
done Spark-natively.

Reference behavior (app/app3_ML.py:143-182): a driver-side thread
refits sklearn IsolationForest(contamination=0.05, random_state=42)
every 5 s over a per-plant-type deque window, labels -1/1, and keeps
the newest 100 outliers. Single-node, lock-serialized.

Here the same semantics run ON EXECUTORS via grouped ``applyInPandas``:
one Arrow batch per plant type (4 groups — at real scale, group count =
parallelism; for high-cardinality keys this shards naturally). The
model is the pure-numpy IsolationForest in functions/iforest.py
(sklearn is unavailable; same published algorithm, same
contamination-threshold labeling).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_data_anomaly_detection_spark.functions.iforest import IsolationForest
from real_time_data_anomaly_detection_spark.schemas import PLANT_FEATURES


def _scored_schema(df: DataFrame) -> T.StructType:
    return T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("anomaly", T.IntegerType(), True),
            T.StructField("score", T.DoubleType(), True),
        ]
    )


def score_anomalies(
    df: DataFrame,
    features_map: dict[str, list[str]] | None = None,
    contamination: float = 0.05,
    random_state: int = 42,
    min_rows: int = 50,
    group_col: str = "plant_type",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Per-group IsolationForest fit+score, distributed.

    Output = input columns + ``anomaly`` (-1 outlier / 1 normal / 0
    unscored: null-feature rows and warm-up groups under ``min_rows``,
    the reference's guard at app/app3_ML.py:151-152) + ``score``.

    Rows are sorted by (ts, features) inside each group before fitting:
    Spark shuffle order is nondeterministic, and identical window
    contents must yield identical models (SURVEY.md §7 hard-part 2).
    """
    fmap = features_map or PLANT_FEATURES
    schema = _scored_schema(df)
    out_cols = [f.name for f in schema.fields]

    # No annotations: `from __future__ import annotations` stringifies
    # them and applyInPandas' hint inspection warns; positional API is used.
    def _score(key, pdf):
        plant = key[0]
        features = fmap.get(plant)
        pdf = pdf.copy()
        pdf["anomaly"] = 0
        pdf["score"] = float("nan")
        if features is None:
            return pdf[out_cols]
        complete = pdf.dropna(subset=features)
        if len(complete) < min_rows:
            return pdf[out_cols]
        complete = complete.sort_values([ts_col] + features, kind="mergesort")
        X = complete[features].astype(float).to_numpy()
        model = IsolationForest(
            contamination=contamination, random_state=random_state
        ).fit(X)
        scores = model.score_samples(X)
        import numpy as np

        threshold = np.quantile(scores, 1.0 - contamination)
        labels = np.where(scores > threshold, -1, 1)
        pdf.loc[complete.index, "anomaly"] = labels
        pdf.loc[complete.index, "score"] = scores
        return pdf[out_cols]

    return df.groupBy(group_col).applyInPandas(_score, schema)


def outliers(scored: DataFrame) -> DataFrame:
    """Rows labeled anomalous (reference app/app3_ML.py:169-171)."""
    return scored.filter(F.col("anomaly") == -1)


def latest_outliers(
    scored: DataFrame,
    k: int = 100,
    group_col: str = "plant_type",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Newest k outliers per group — the reference's retention policy
    (app/app3_ML.py:177-180) as a rank window instead of a pandas tail."""
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(F.desc(ts_col))
    return (
        outliers(scored)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def embedding_distance_threshold(
    df: DataFrame,
    centroids,
    vec_col: str = "embedding",
    quantile: float = 0.95,
) -> float:
    """Calibrate an outlier threshold OFFLINE: the ``quantile`` of
    squared nearest-centroid distances over a reference (training)
    batch. One scan + an approxQuantile — run once, ship the float."""
    scored = score_embedding_outliers(df, centroids, vec_col=vec_col, threshold=None)
    return scored.approxQuantile("dist2", [quantile], 1e-3)[0]


def score_embedding_outliers(
    df: DataFrame,
    centroids,
    vec_col: str = "embedding",
    threshold: float | None = None,
) -> DataFrame:
    """Nearest-centroid distance scoring for embedding streams: adds
    ``cell`` (nearest k-means cell), ``dist2`` (squared distance to
    it), and — when ``threshold`` is given — ``anomaly`` (-1 outlier
    / 1 normal, the reference's label convention).

    STATELESS per row (centroids fit offline via
    ``operators.clustering.kmeans_fit``, threshold via
    ``embedding_distance_threshold``), so the same code path runs on a
    batch frame or inside a Structured Streaming query with no state
    store and no watermark — per micro-batch it is one Arrow pass,
    exactly the semantic-drift monitor a production embedding pipeline
    bolts onto ingest. The reference scores sensor rows per-window
    with IsolationForest (app/app3_ML.py:165-169); this is the same
    shape for embedding payloads with a closed-form detector."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    cols = df.columns

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = (
                (X * X).sum(axis=1)[:, None]
                - 2.0 * (X @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            out = pdf[cols].copy()
            out["cell"] = d2.argmin(axis=1).astype(np.int32)
            out["dist2"] = np.maximum(d2.min(axis=1), 0.0)
            if threshold is not None:
                out["anomaly"] = np.where(out["dist2"] > threshold, -1, 1).astype(
                    np.int32
                )
            yield out

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, cell int, dist2 double"
    if threshold is not None:
        schema += ", anomaly int"
    return df.mapInPandas(score, schema)
