"""Training-data pipeline ops: decontamination, hash sampling,
sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.operators.pipeline_ops import (
    contamination_hits,
    decontaminate,
    hash_sample,
    pack_sequences,
)


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),          # bench
        (1, "pack my box with five dozen liquor jugs"),              # bench
        (100, "the quick brown fox jumps over a sleeping cat"),      # contaminated (4 shared 3-grams)
        (101, "pack my box with plenty of careful padding"),         # contaminated (2 shared)
        (102, "completely unrelated sentence about spark executors"),
        (103, "another clean document with no benchmark overlap"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_hits_and_decontaminate(spark):
    d = _docs(spark)
    bench = d.filter(F.col("doc_id") < 100)
    train = d.filter(F.col("doc_id") >= 100)
    hits = {
        (r.train_id, r.bench_id): r.hits
        for r in contamination_hits(train, bench).collect()
    }
    # doc 100 shares "the quick brown","quick brown fox","brown fox jumps",
    # "fox jumps over" with doc 0; doc 101 shares "pack my box","my box with".
    assert hits[(100, 0)] == 4
    assert hits[(101, 1)] == 2
    assert (102, 0) not in hits and (103, 0) not in hits

    kept = sorted(
        r.doc_id for r in decontaminate(train, bench, min_hits=2).collect()
    )
    assert kept == [102, 103]


def test_hash_sample_deterministic_and_unbiased(spark):
    df = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    a = {r.doc_id for r in hash_sample(df, F.lit("40")).collect()}
    b = {r.doc_id for r in hash_sample(df, F.lit("40")).collect()}
    assert a == b  # deterministic, no RNG state
    # '40'/256 = 25% nominal; md5 is uniform so 4000 draws stay close.
    assert 0.20 < len(a) / 4000 < 0.30
    # monotone: a tighter threshold selects a subset
    c = {r.doc_id for r in hash_sample(df, F.lit("20")).collect()}
    assert c <= a


def _reference_pack(items, max_tokens):
    """Sequential greedy packer (the semantics pack_sequences must
    reproduce per bucket, in id order)."""
    packs, current, total = {}, 0, 0
    for doc_id, tok in items:
        if total > 0 and total + tok > max_tokens:
            current += 1
            total = 0
        total += tok
        packs[doc_id] = current
    return packs


def test_pack_sequences_matches_sequential_reference(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(50, 900)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r.doc_id: (r.pack_id, r.pack_tokens)
        for r in pack_sequences(df, max_tokens=1024, num_buckets=4).collect()
    }
    assert len(got) == 500

    toks = dict(rows)
    for bucket in range(4):
        items = sorted((i, t) for i, t in rows if i % 4 == bucket)
        want = _reference_pack(items, 1024)
        for doc_id, local_pack in want.items():
            assert got[doc_id][0] == (bucket << 40) + local_pack

    # pack budget respected; pack_tokens is the true pack total
    by_pack = {}
    for doc_id, (pack_id, pack_tokens) in got.items():
        by_pack.setdefault(pack_id, [0, pack_tokens])
        by_pack[pack_id][0] += toks[doc_id]
    for pack_id, (true_total, reported) in by_pack.items():
        assert true_total == reported
        assert true_total <= 1024 or len(
            [d for d in got if got[d][0] == pack_id]
        ) == 1  # oversized doc alone in its pack


def test_pack_sequences_partition_count_invariant(spark):
    rows = [(i, 100 + i % 300) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = {tuple(r) for r in pack_sequences(df, 1024).collect()}
    b = {
        tuple(r)
        for r in pack_sequences(df.repartition(17), 1024).collect()
    }
    assert a == b  # explicit doc_id % P bucketing, not partition-dependent


def test_dsir_weights_separate_domains(spark):
    """Two vocabulary-disjoint domains: target-domain docs must score
    positive log-weights, off-domain negative, and a mixed doc sits
    between them."""
    from pyspark.sql import functions as F

    from real_time_data_anomaly_detection_spark.operators.pipeline_ops import (
        dsir_log_weights,
    )

    target = ["wiki article history science culture" ] * 3
    raw = ["spam click buy cheap deal offer"] * 3
    mixed = ["wiki article spam click history buy"]
    rows = (
        [(i, t, True) for i, t in enumerate(target)]
        + [(10 + i, t, False) for i, t in enumerate(raw)]
        + [(20, mixed[0], False)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, is_tgt boolean")
    w = {
        r.doc_id: r.log_weight
        for r in dsir_log_weights(df, F.col("is_tgt")).collect()
    }
    for i in range(3):
        assert w[i] > 0, (i, w[i])
        assert w[10 + i] < 0, (i, w[10 + i])
    assert w[10] < w[20] < w[0], w


# ---------------------------------------------------------------------------
# Efraimidis–Spirakis weighted top-k sampling


def _weighted_corpus(spark):
    # ids 0..399: even ids weight 10.0, odd ids weight 0.1
    rows = [(i, 10.0 if i % 2 == 0 else 0.1) for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, w double")


def test_weighted_topk_exact_size_and_determinism(spark):
    from real_time_data_anomaly_detection_spark.operators.pipeline_ops import (
        weighted_topk_sample,
    )
    from pyspark.sql import functions as F

    d = _weighted_corpus(spark)
    a = sorted(
        r.doc_id
        for r in weighted_topk_sample(d.repartition(1), F.col("w"), 50).collect()
    )
    b = sorted(
        r.doc_id
        for r in weighted_topk_sample(d.repartition(11), F.col("w"), 50).collect()
    )
    assert len(a) == 50 and a == b


def test_weighted_topk_prefers_heavy_rows(spark):
    from real_time_data_anomaly_detection_spark.operators.pipeline_ops import (
        weighted_topk_sample,
    )
    from pyspark.sql import functions as F

    d = _weighted_corpus(spark)
    picked = [
        r.doc_id for r in weighted_topk_sample(d, F.col("w"), 50).collect()
    ]
    heavy = sum(1 for i in picked if i % 2 == 0)
    # with a 100x weight ratio the heavy class must dominate hard
    assert heavy >= 45


def test_weighted_topk_matches_numpy_replay(spark):
    import hashlib
    import math

    from real_time_data_anomaly_detection_spark.operators.pipeline_ops import (
        weighted_topk_sample,
    )
    from pyspark.sql import functions as F

    rows = [(i, 0.25 + (i % 13) / 13.0) for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id long, w double")
    got = sorted(
        r.doc_id for r in weighted_topk_sample(d, F.col("w"), 30).collect()
    )

    def key(i, w):
        u32 = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        u = (u32 + 0.5) / 2**32
        return math.log(u) / w

    want = sorted(
        i for i, _ in sorted(rows, key=lambda t: (-key(*t), t[0]))[:30]
    )
    assert got == want


def test_url_canonicalize_rules(spark):
    """Each canonicalization rule individually: case, www., default
    ports, utm_* params, fragments, trailing slash — and that a
    non-tracking param survives in original position."""
    from real_time_data_anomaly_detection_spark.operators.pipeline_ops import (
        canonicalize_urls,
    )

    rows = [
        (1, "HTTPS://WWW.A.Example.COM:443/x/y?utm_source=f&q=1&utm_c=z#top"),
        (2, "http://a.example.com:80/x/y/"),
        (3, "https://b.example.com/"),
        (4, "https://b.example.com/p?a=1&b=2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r.doc_id: r for r in canonicalize_urls(df).collect()}
    assert out[1].host == "a.example.com"
    assert out[1].canon_url == "https://a.example.com/x/y?q=1"
    assert out[2].canon_url == "http://a.example.com/x/y"
    assert out[3].canon_url == "https://b.example.com"
    assert out[4].canon_url == "https://b.example.com/p?a=1&b=2"


def test_url_host_cap_dedup_and_quota(spark):
    """Keep-newest per canonical URL, then per-host quota newest
    first: doc 10 and 11 canonicalize identically (11 survives), and
    host 'big.example.com' is capped at 2 of its 4 distinct URLs."""
    from real_time_data_anomaly_detection_spark.operators.pipeline_ops import (
        url_host_cap,
    )

    rows = [
        (10, "https://WWW.dup.example.com:443/a?utm_x=1"),
        (11, "https://dup.example.com/a"),          # same canon as 10
        (20, "https://big.example.com/p1"),
        (21, "https://big.example.com/p2"),
        (22, "https://big.example.com/p3"),
        (23, "https://big.example.com/p4"),
        (30, "http://small.example.com/only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = [
        (r.host, r.doc_id)
        for r in url_host_cap(df, cap=2).collect()
    ]
    assert got == [
        ("big.example.com", 22),
        ("big.example.com", 23),
        ("dup.example.com", 11),
        ("small.example.com", 30),
    ]


def test_negative_zero_publication_idiom(spark):
    """The `round(x, 4) + 0.0` publication idiom must normalize IEEE
    -0.0 to +0.0 on BOTH engines — the sf0.1 q_dsir_weights value-hash
    mismatch was DuckDB printing -0.0 where Spark printed 0.0 for a
    tiny negative sum that rounds to zero. Pins the idiom directly on
    the offending input class."""
    import math

    import duckdb

    for expr in ("round(-1e-9, 4)", "round(-0.0, 4)"):
        raw, fixed = duckdb.connect().execute(
            f"SELECT {expr}, {expr} + 0.0"
        ).fetchone()
        assert math.copysign(1.0, fixed) == 1.0, (expr, raw, fixed)
    row = spark.range(1).select(
        (F.round(F.lit(-1e-9), 4) + F.lit(0.0)).alias("a"),
        (F.round(F.lit(-0.0), 4) + F.lit(0.0)).alias("b"),
    ).head()
    assert math.copysign(1.0, row.a) == 1.0
    assert math.copysign(1.0, row.b) == 1.0


def test_temperature_sample_flattens_head(spark):
    """α<1 must keep a LARGER fraction of low-resource groups than of
    the head group (the XLM-R flattening property), while α=1 keeps
    ~the same fraction everywhere (natural proportions). Also:
    deterministic across partitionings."""
    from real_time_data_anomaly_detection_spark.operators.pipeline_ops import (
        temperature_sample,
    )

    rows = [(i, "big" if i < 1600 else "small") for i in range(2000)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")

    def frac(alpha):
        kept = temperature_sample(d, "lang", alpha=alpha, total=500).groupBy(
            "lang"
        ).count()
        k = {r.lang: r["count"] for r in kept.collect()}
        return k.get("big", 0) / 1600, k.get("small", 0) / 400

    fb_half, fs_half = frac(0.5)
    assert fs_half > fb_half * 1.5  # flattened: small keeps much more
    fb_one, fs_one = frac(1.0)
    assert abs(fb_one - fs_one) < 0.12  # natural: ~equal keep rates

    a = sorted(
        r.doc_id
        for r in temperature_sample(
            d.repartition(17), "lang", 0.5, 500
        ).collect()
    )
    b = sorted(
        r.doc_id
        for r in temperature_sample(
            d.repartition(3), "lang", 0.5, 500
        ).collect()
    )
    assert a == b
