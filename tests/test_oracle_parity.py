"""Every registered query must match its DuckDB oracle at sf0.001.

This is the same comparison the driver runs at sf0.01 (row count +
column-name schema + order-insensitive value multiset).
"""

from __future__ import annotations

import pytest

from real_time_data_anomaly_detection_spark.operators import REGISTRY
from tests.conftest import SF_DIR
from tools.verify_oracle import rows_multiset

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


@pytest.mark.parametrize(
    "name",
    [
        "q_date_funcs",
        "q_window_tumbling_batch",
        "q_agg_global",
        "q_asof_join",
        # intercept extrapolates to x=0, so a session-tz-dependent x
        # would shift it — x is built tz-free from date/time fields
        "q_regression",
    ],
)
def test_time_queries_session_tz_independent(name, spark, duck):
    """The driver controls its own session tz; time-derived outputs must
    not shift under a non-UTC session (events.ts is TIMESTAMP_NTZ via
    pure epoch arithmetic — io.load_table)."""
    q = REGISTRY[name]
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        srows = [tuple(r) for r in q.spark_fn(spark, SF_DIR).collect()]
        scols = q.spark_fn(spark, SF_DIR).columns
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    res = duck.execute(q.oracle)
    dcols = [d[0] for d in res.description]
    assert rows_multiset(scols, srows) == rows_multiset(dcols, res.fetchall())


def test_driver_gate_window_is_cross_family():
    """The driver's CORRECTNESS artifact samples the FIRST 50 registry
    entries. Pin that the curated window (operators/__init__.py) is
    all oracle-backed and spans every §2.3 family — a future import
    reshuffle must not silently revert it to all-relational."""
    window = list(REGISTRY)[:50]
    assert all(REGISTRY[n].oracle is not None for n in window)
    flagship = {
        "q_dedup_exact",        # dedup
        "q_minhash_neardup_md5",  # LSH sketch algebra
        "q_components_md5",     # graph connectivity
        "q_exact_substring_dedup",  # curation
        "q_bm25",               # retrieval
        "q_countmin_freq",      # sketch
        "q_hll_md5",            # sketch
        "q_pagerank",           # iterative graph
        "q_funnel",             # behavior
        "q_shard_manifest",     # output layout
        "q_merge_upsert",       # CDC
        "q_curation_pipeline",  # end-to-end pipeline
        "q_cosine_topk",        # similarity
        "q_text_tokens",        # text analysis
        "q_resample_ffill_15m",  # time-series
        "q_lm_perplexity",      # LM scoring
        # round-8 rotation (VERDICT r7 #4): round-7 flagships + the
        # round-8 URL ingest staple now under the driver's hard gate
        "q_prefix_jaccard",     # lossless PPJoin
        "q_split_leakage_safe",  # cluster-level split
        "q_hierarchy_flatten",  # recursive flatten
        "q_cusum_alarms",       # change-point detection
        "q_quantile_sketch",    # KMV sketch
        "q_ohlc_bars",          # time-series rollup
        "q_url_host_cap",       # URL canonicalization + host quota
        # round-9 rotation: decoder-oracle-checked media + drift
        # (r13 rotated q_audio_fingerprint_md5 out; audio stays green
        # in the full sweeps and media keeps 7 rows in-window)
        "q_image_neardup_md5",  # perceptual dHash through real decode
        "q_category_drift",     # chi-square distribution drift
        # round-11 rotation: the complete drift quartet + aHash twin
        "q_ks_drift",           # exact integer two-sample KS
        "q_emd_drift",          # exact integer earth-mover's drift
        "q_holt_forecast",      # oracle-gated grouped-map forecasting
        "q_drift_report",       # fused single-scan chi2/PSI/KS/EMD report
        "q_image_ahash_md5",    # identity-grid aHash twin
        # round-12 rotation: the video md5 trio (q_psi_drift and the
        # image index/admit twins rotated out — q_drift_report carries
        # PSI, and the video analogs exercise the same index algebra)
        "q_video_dhash_md5",    # container walk + JPEG decode + dHash
        "q_video_index_md5",    # persisted seen-frame index match
        "q_video_ingest_admit_md5",  # frame-coverage admission rule
        # round-13 rotation (VERDICT r12 #3): the remaining video
        # oracle twins + the bounded-state drift grid promoted
        # (q_union_all / q_window_lastk / q_audio_fingerprint_md5 out)
        "q_video_scene_cuts_md5",  # hash-delta scene detection
        "q_video_neardup_md5",  # frame-containment video pairs
        "q_ks_drift_bucketed",  # bucket_edges valve grid algebra
    }
    assert flagship <= set(window), flagship - set(window)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, duck):
    q = REGISTRY[name]
    sdf = q.spark_fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(q.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"schema mismatch: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}"
    assert rows_multiset(scols, srows) == rows_multiset(dcols, drows)


def test_gate_window_pandas_fetch_parity(spark, duck):
    """Simulate the DRIVER's fetch path over the 50-query gate window:
    it reads DuckDB results through pandas, where HUGEINT → float64,
    DECIMAL → float64, DATE → Timestamp — conversions fetchall() never
    exercises, which is exactly how the round-6 q_shard_manifest /
    q_curation_pipeline hash mismatches slipped past local verify.
    Canonicalize the pandas frame back to plain Python values and
    compare against Spark's collect() multiset. Covers the 50-query
    window plus every round-7 addition (queries outside the window see
    this fetch path only when a judge or future window promotion runs
    them — cheap to de-risk here)."""
    import datetime
    from collections import Counter

    import numpy as np
    import pandas as pd

    from real_time_data_anomaly_detection_spark.operators import _GATE_WINDOW
    from tools.verify_oracle import canon

    def canon2(v):
        # a DATE surfaces as a midnight Timestamp through pandas, so
        # canonicalize dates to full midnight datetimes on BOTH sides
        if isinstance(v, datetime.date) and not isinstance(
            v, datetime.datetime
        ):
            v = datetime.datetime(v.year, v.month, v.day)
        return canon(v)

    def canon_pd(v):
        # pandas surfaces SQL NULL in numeric columns as NaN
        if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
            return "NULL"
        if isinstance(v, np.generic):
            v = v.item()
        if isinstance(v, pd.Timestamp):
            v = v.to_pydatetime()
        if isinstance(v, np.ndarray):
            v = v.tolist()
        return canon2(v)

    round7 = [
        "q_prefix_jaccard",
        "q_phrase_search",
        "q_index_phrase_search",
        "q_rrf_fusion",
        "q_containment_pairs",
        "q_embed_drift",
        "q_cluster_stats_md5",
        "q_novelty_scores",
        "q_cusum_alarms",
        "q_anomaly_seasonal",
        "q_quantile_sketch",
        "q_split_leakage_safe",
        "q_data_quality_report",
        "q_hierarchy_flatten",
        "q_kmv_jaccard",
    ]
    mismatches = {}
    for name in list(_GATE_WINDOW) + round7:
        q = REGISTRY[name]
        sdf = q.spark_fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        pdf = duck.execute(q.oracle).df()
        dcols = list(pdf.columns)
        drows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
        sorder = sorted(range(len(scols)), key=lambda i: scols[i])
        dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sm = Counter(tuple(canon2(r[i]) for i in sorder) for r in srows)
        dm = Counter(tuple(canon_pd(r[i]) for i in dorder) for r in drows)
        if sm != dm:
            diff = list((sm - dm).items())[:2] + list((dm - sm).items())[:2]
            mismatches[name] = diff
    assert not mismatches, f"pandas-fetch divergence: {mismatches}"


def test_no_oracle_publishes_hugeint(duck):
    """DuckDB's sum() over integer columns returns HUGEINT (int128).
    fetchall() gives exact Python ints, but a pandas/Arrow fetch — which
    the driver's gate uses — converts HUGEINT to float64 / decimal128,
    so `161383887360.0` hash-mismatches Spark's BIGINT `161383887360`
    even though the values are equal (round-6 q_shard_manifest /
    q_curation_pipeline driver failures). Every oracle must CAST such
    aggregates to BIGINT at publication."""
    offenders = {}
    for name in ORACLE_QUERIES:
        desc = duck.execute(f"DESCRIBE ({REGISTRY[name].oracle})").fetchall()
        bad = [
            (col, typ)
            for col, typ, *_ in desc
            if typ in ("HUGEINT", "UHUGEINT") or typ.startswith("DECIMAL(38")
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"oracles publishing HUGEINT: {offenders}"


def test_results_partition_count_invariant(spark):
    """The driver gate runs under ITS OWN session config — results must
    not depend on spark.sql.shuffle.partitions. Representative shapes:
    stateful packing, window rank, multi-join agg, LSH near-dup."""
    from real_time_data_anomaly_detection_spark.operators import REGISTRY

    names = [
        "q_pack_sequences",
        "q_window_rank",
        "q_tpch_q10",
        "q_minhash_neardup",
        # round-5 additions: sample-fit clustering decisions and PQ/ADC
        # ranking must not depend on how the input is split
        "q_semantic_dedup",
        "q_pq_topk",
        "q_dsir_weights",
    ]
    sf = "/root/testdata/sf0.001"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for parts in ("3", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            results[parts] = {
                n: sorted(tuple(r) for r in REGISTRY[n].spark_fn(spark, sf).collect())
                for n in names
            }
        for n in names:
            assert results["3"][n] == results["32"][n], n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_registry_artifact_sync():
    """Every REGISTRY query appears in the committed evidence chain —
    COVERAGE.md (with an exact counts line) and CORRECTNESS_FULL.json
    (all oracle-backed rows passing) — and the bench/plan tool lists
    contain no stale names. Pins the round-7 q_ohlc_bars lesson: a
    query added after the last artifact regen left a hole in the
    round's own evidence (VERDICT r7 What's-wrong #1)."""
    import json
    import re

    cov = open("/root/repo/COVERAGE.md").read()
    missing_cov = [n for n in REGISTRY if f"`{n}`" not in cov]
    assert not missing_cov, f"COVERAGE.md stale, regen: {missing_cov}"
    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle)
    counts = re.search(r"\*\*(\d+) declared queries, (\d+) oracle-backed", cov)
    assert counts, "COVERAGE.md counts line missing"
    assert (int(counts.group(1)), int(counts.group(2))) == (
        len(REGISTRY),
        n_oracle,
    ), "COVERAGE.md counts line stale — rerun tools/gen_coverage.py"

    full = json.load(open("/root/repo/CORRECTNESS_FULL.json"))
    recs = {r["name"]: r for r in full["queries"]}
    assert set(recs) == set(REGISTRY), (
        "CORRECTNESS_FULL.json stale — rerun tools/verify_oracle.py --json: "
        f"missing={sorted(set(REGISTRY) - set(recs))[:5]} "
        f"extra={sorted(set(recs) - set(REGISTRY))[:5]}"
    )
    bad = {
        n: r["status"]
        for n, r in recs.items()
        if r["status"] != ("pass" if REGISTRY[n].oracle else "no_oracle")
    }
    assert not bad, f"non-green rows in CORRECTNESS_FULL.json: {bad}"
    assert full["n_pass"] == n_oracle and full["n_fail"] == 0

    # The sf0.1 full sweep is part of the standing evidence chain too
    # (round-8 verdict #7): it has caught half-boundary/-0.0/1-ulp
    # divergences the sf0.01 gate scale never hits.
    sf01 = json.load(open("/root/repo/CORRECTNESS_SF0_1.json"))
    recs01 = {r["name"]: r for r in sf01["queries"]}
    assert set(recs01) == set(REGISTRY), (
        "CORRECTNESS_SF0_1.json stale — rerun tools/verify_oracle.py "
        "--json CORRECTNESS_SF0_1.json /root/testdata/sf0.1: "
        f"missing={sorted(set(REGISTRY) - set(recs01))[:5]} "
        f"extra={sorted(set(recs01) - set(REGISTRY))[:5]}"
    )
    bad01 = {
        n: r["status"]
        for n, r in recs01.items()
        if r["status"] != ("pass" if REGISTRY[n].oracle else "no_oracle")
    }
    assert not bad01, f"non-green rows in CORRECTNESS_SF0_1.json: {bad01}"
    assert sf01["n_pass"] == n_oracle and sf01["n_fail"] == 0

    import bench
    from tools.gen_plans import QUERIES as plan_queries

    stale_plan = [n for n in plan_queries if n not in REGISTRY]
    assert not stale_plan, f"gen_plans.QUERIES stale names: {stale_plan}"
    src = open("/root/repo/bench.py").read()
    bench_names = set(re.findall(r'"(q_[a-z0-9_]+)"', src))
    stale_bench = [n for n in bench_names if n not in REGISTRY]
    assert not stale_bench, f"bench.py references unknown queries: {stale_bench}"
    assert "q_ohlc_bars" in bench_names and "q_ohlc_bars" in plan_queries
