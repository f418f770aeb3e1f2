"""Text analysis: language ID on a real multilingual fixture, rolling
fingerprints, quality features."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.operators.textops import (
    lang_id,
    rolling_fingerprint,
)


def test_lang_id_on_multilingual_sentences(spark):
    rows = [
        (0, "the cat sat on the mat and it was happy that day", "en"),
        (1, "der hund ist nicht mit der katze auf den tisch", "de"),
        (2, "le chat est dans la maison et les enfants sont la", "fr"),
        (3, "el perro es un animal que vive en la casa por los campos", "es"),
        (4, "我 是 一个 人 和 你 在 的 地方 有 不 同", "zh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, truth string")
    out = lang_id(df).select("doc_id", "lang_pred", "truth").collect()
    for r in out:
        assert r.lang_pred == r.truth, r


def test_lang_id_unknown(spark):
    df = spark.createDataFrame([(0, "zzz qqq xxx www")], "doc_id long, text string")
    r = out = lang_id(df).head()
    assert r.lang_pred == "und"
    assert r.lang_score == 0.0


def test_rolling_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "c b a")], "doc_id long, text string"
    )
    fps = {r.doc_id: r.fingerprint for r in rolling_fingerprint(df).collect()}
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]  # same tokens, different order
