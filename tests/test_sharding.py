"""Deterministic sharding: assignment stability, balance, write
round-trip with manifest verification, and within-shard order."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.operators.sharding import (
    shard_assign,
    shard_manifest,
    write_shards,
    interleave_sql,
    zorder_layout_report,
)


def _docs(spark, n=1000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("text"), F.col("id")).alias("text")
    )


def test_assignment_partitioning_invariant(spark):
    d = _docs(spark)
    a = {r.doc_id: r.shard for r in shard_assign(d.repartition(1), "doc_id", 16).collect()}
    b = {r.doc_id: r.shard for r in shard_assign(d.repartition(13), "doc_id", 16).collect()}
    assert a == b


def test_shards_balanced(spark):
    counts = [
        r.n_docs for r in shard_manifest(_docs(spark, 4000), "doc_id", 16).collect()
    ]
    assert len(counts) == 16
    # hashed assignment: every shard within 40% of the mean at n=4000
    assert min(counts) > 250 * 0.6 and max(counts) < 250 * 1.4


def test_write_round_trip_manifest_verifies(spark, tmp_path):
    d = _docs(spark, 500)
    path = str(tmp_path / "shards")
    manifest = {
        (r.shard, r.n_docs, r.checksum)
        for r in write_shards(d, path, "doc_id", 8).collect()
    }
    back = spark.read.parquet(path)
    # recompute the manifest from what was actually written
    recomputed = {
        (r.shard, r.n_docs, r.checksum)
        for r in shard_manifest(
            back.select("doc_id", "text"), "doc_id", 8
        ).collect()
    }
    assert recomputed == manifest
    assert back.count() == 500
    # shard column on disk equals the recomputed assignment
    mismatch = (
        back.withColumnRenamed("shard", "disk_shard")
        .transform(lambda df: shard_assign(df, "doc_id", 8))
        .filter(F.col("disk_shard") != F.col("shard"))
        .count()
    )
    assert mismatch == 0


def test_within_shard_order_deterministic(spark, tmp_path):
    d = _docs(spark, 300)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_shards(d.repartition(1), p1, "doc_id", 4)
    write_shards(d.repartition(7), p2, "doc_id", 4)
    for shard in range(4):
        r1 = [r.doc_id for r in spark.read.parquet(f"{p1}/shard={shard}").collect()]
        r2 = [r.doc_id for r in spark.read.parquet(f"{p2}/shard={shard}").collect()]
        assert r1 == r2 and len(r1) > 0


def test_md5_and_xxhash_paths_agree_on_structure(spark):
    # different hashers -> different assignments, but both cover all
    # shards and preserve the corpus (sum of counts).
    d = _docs(spark, 800)
    for hasher in ("xxhash64", "md5"):
        m = shard_manifest(d, "doc_id", 8, hasher=hasher).collect()
        assert len(m) == 8
        assert sum(r.n_docs for r in m) == 800


def test_interleave_sql_is_morton(spark):
    # spot-check the generated arithmetic against a Python bit-interleave
    def morton(x, y, bits=8):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i + 1)
            z |= ((y >> i) & 1) << (2 * i)
        return z

    pts = [(0, 0), (255, 255), (1, 0), (0, 1), (170, 85), (200, 3)]
    df = spark.createDataFrame(pts, "xq int, yq int")
    got = {
        (r.xq, r.yq): r.z
        for r in df.selectExpr("xq", "yq", f"{interleave_sql('xq', 'yq', 8)} AS z").collect()
    }
    assert got == {(x, y): morton(x, y) for x, y in pts}


def test_zorder_prunes_no_worse_than_linear(spark):
    # 2-D clustered layout must never scan more rows than the 1-D sort
    # for a 2-D rectangle, and both layouts must agree on the true
    # match count (the result is layout-invariant).
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    rows = {r.layout: r for r in zorder_layout_report(li, "l_partkey", "l_suppkey").collect()}
    assert set(rows) == {"linear", "zorder"}
    assert rows["zorder"].rows_matching == rows["linear"].rows_matching
    assert rows["zorder"].rows_scanned <= rows["linear"].rows_scanned
    for r in rows.values():
        assert r.rows_matching <= r.rows_scanned


def test_epoch_order_properties(spark):
    """Epoch shuffle: (1) identical across partitionings (pure
    function of id+epoch), (2) different epochs give genuinely
    different permutations, (3) ranks within each shard are exactly
    1..n with no gaps, (4) every doc appears exactly once."""
    from real_time_data_anomaly_detection_spark.operators.sharding import (
        epoch_order,
    )

    d = _docs(spark, 500)
    e1a = [(r.shard, r.rank, r.doc_id)
           for r in epoch_order(d.repartition(1), "doc_id", 8, 1).collect()]
    e1b = [(r.shard, r.rank, r.doc_id)
           for r in epoch_order(d.repartition(13), "doc_id", 8, 1).collect()]
    assert e1a == e1b  # partitioning-invariant

    e2 = [(r.shard, r.rank, r.doc_id)
          for r in epoch_order(d, "doc_id", 8, 2).collect()]
    assert e1a != e2  # epochs permute independently
    assert {t[2] for t in e1a} == {t[2] for t in e2} == set(range(500))

    from collections import defaultdict

    by_shard = defaultdict(list)
    for s, rk, _ in e1a:
        by_shard[s].append(rk)
    for s, ranks in by_shard.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), s


def test_epoch_order_two_level_rank_matches_single_level(spark):
    """Round-8 verdict #2: the scale-safe two-level rank (md5-prefix
    subshards + offset sum) must publish ranks IDENTICAL to the
    single-level definition row_number() over (partition by shard
    order by sort_key, id) — checked by recomputing the naive rank in
    pandas — and its window must partition on (shard, _sub), never a
    whole shard in one task."""
    from real_time_data_anomaly_detection_spark.operators.sharding import (
        epoch_order,
        shard_assign,
    )
    from real_time_data_anomaly_detection_spark.plans.inspect import (
        formatted_plan,
    )

    d = _docs(spark, 1000)
    got = [
        (r.shard, r.rank, r.doc_id)
        for r in epoch_order(d, "doc_id", 4, 1, hasher="md5").collect()
    ]
    # naive single-level reference, computed driver-side
    a = shard_assign(d, "doc_id", 4, 1001, "md5").select(
        "shard", "sort_key", "doc_id"
    ).toPandas()
    a = a.sort_values(["shard", "sort_key", "doc_id"], kind="mergesort")
    a["rank"] = a.groupby("shard").cumcount() + 1
    want = sorted(
        (int(r.shard), int(r.rank), int(r.doc_id)) for r in a.itertuples()
    )
    assert sorted(got) == want

    plan = formatted_plan(epoch_order(d, "doc_id", 4, 1, hasher="md5"))
    # the rank window's sort keys include _sub => per-slice tasks
    assert "_sub" in plan
