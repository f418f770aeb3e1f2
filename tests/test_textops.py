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


def test_scrub_pii_redacts_and_counts(spark):
    from real_time_data_anomaly_detection_spark.operators.textops import scrub_pii

    rows = [
        (0, "mail me at jane.doe+x@sub.example.co.uk thanks"),
        (1, "server at 10.0.255.7 and 192.168.1.1 responded"),
        (2, "call +4915112345678 now"),
        (3, "nothing sensitive here at all"),
        (4, "mix bob@x.io from 8.8.8.8 dial +15550001111 end"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert out[0].clean_text == "mail me at <EMAIL> thanks"
    assert (out[0].n_email, out[0].n_ip, out[0].n_phone) == (1, 0, 0)
    assert out[1].clean_text == "server at <IP> and <IP> responded"
    assert out[1].n_ip == 2
    assert out[2].clean_text == "call <PHONE> now"
    assert out[3].clean_text == out[3].text  # untouched
    assert out[4].clean_text == "mix <EMAIL> from <IP> dial <PHONE> end"
    assert (out[4].n_email, out[4].n_ip, out[4].n_phone) == (1, 1, 1)


def test_gopher_rules_flags(spark):
    from real_time_data_anomaly_detection_spark.operators.textops import gopher_rules

    long_good = " ".join(["the", "and", "with", "that", "house"] * 12)  # 60 words, mean len 3.8
    short = "the and of tiny"                                  # fails word count
    no_stop = " ".join(["zebra", "quartz"] * 30)               # no required stopwords
    digits = " ".join(["12345", "the", "and"] * 20)            # 1/3 alpha words
    df = spark.createDataFrame(
        [(0, long_good), (1, short), (2, no_stop), (3, digits)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert out[0].passes == 1
    assert out[1].flag_words == 0 and out[1].passes == 0
    assert out[2].flag_stop == 0 and out[2].passes == 0
    assert out[3].flag_alpha == 0 and out[3].passes == 0
    # per-rule metrics sane
    assert out[0].n_words == 60 and out[0].n_stop == 4


def test_scrub_pii_idempotent(spark):
    """Redaction is a fixpoint: scrubbing already-scrubbed text changes
    nothing (the replacement tokens match no PII pattern)."""
    from real_time_data_anomaly_detection_spark.operators.textops import scrub_pii

    rows = [
        (0, "mix bob@x.io from 8.8.8.8 dial +15550001111 end"),
        (1, "already clean <EMAIL> <IP> <PHONE> text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = scrub_pii(df).select("doc_id", F.col("clean_text").alias("text"))
    twice = scrub_pii(once)
    for r in twice.collect():
        assert r.clean_text == r.text, r
