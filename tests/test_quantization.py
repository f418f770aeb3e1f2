"""Product quantization: distortion behavior, encode determinism,
ADC correctness vs numpy, and recall@10 vs exact cosine top-k."""

from __future__ import annotations

import numpy as np

from real_time_data_anomaly_detection_spark.io import load_table
from real_time_data_anomaly_detection_spark.operators.quantization import (
    pq_adc_topk,
    pq_encode,
    pq_reconstruct,
    pq_train,
)
from tests.conftest import SF_DIR


def _emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_distortion_improves_with_codebook_size(spark):
    e = _emb(spark)
    errs = []
    for k in (4, 16):
        books = pq_train(e, m=8, k=k, sample=256)
        enc = pq_encode(e, books)
        rows = enc.orderBy("vec_id").collect()
        codes = np.stack([np.asarray(r.codes) for r in rows])
        recon = pq_reconstruct(codes, books)
        X = np.stack(
            [np.asarray(r.embedding, dtype=np.float64) for r in e.orderBy("vec_id").collect()]
        )
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        errs.append(((X - recon) ** 2).sum(axis=1).mean())
    assert errs[1] < errs[0], f"k=16 distortion {errs[1]} not < k=4 {errs[0]}"
    # unit-sphere sanity: reconstructing as the zero vector scores 1.0,
    # a random codeword ~2.0; the codebooks must clearly beat both.
    # (This fixture is near-isotropic — the hard case for PQ; real
    # embedding corpora on low-dim manifolds quantize far tighter.)
    assert errs[1] < 0.8, errs


def test_encode_deterministic_across_partitionings(spark):
    e = _emb(spark)
    books = pq_train(e, m=8, k=16)
    a = {r.vec_id: tuple(r.codes) for r in pq_encode(e.repartition(3), books).collect()}
    b = {r.vec_id: tuple(r.codes) for r in pq_encode(e.repartition(17), books).collect()}
    assert a == b


def test_adc_matches_numpy_lut(spark):
    """The JVM-side aggregate/zip_with scoring must equal the numpy
    LUT sum exactly (same doubles, rounded the same)."""
    e = _emb(spark).limit(50)
    books = pq_train(e, m=8, k=8, sample=64)
    probe = np.asarray(
        e.filter("vec_id = 0").select("embedding").head()[0], dtype=np.float64
    )
    enc = pq_encode(e, books)
    got = {r.vec_id: r.adc_dist for r in pq_adc_topk(enc, books, probe, n_results=50).collect()}

    p = probe / np.linalg.norm(probe)
    m, k, dsub = books.shape
    lut = np.stack(
        [((books[j] - p[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1) for j in range(m)]
    )
    for r in enc.collect():
        want = round(sum(lut[j, c] for j, c in enumerate(r.codes)), 4)
        assert abs(got[r.vec_id] - want) < 1e-9, (r.vec_id, got[r.vec_id], want)


def test_pq_recall_vs_exact_topk(spark):
    """Recall@10 of ADC against the exact cosine ranking. PQ on
    this near-isotropic fixture is the hard case (m=16, k=64 measured
    raw 6/10, rerank 10/10; m=8, k=16 only raw 2/10); FAISS
    practice re-ranks an over-fetched candidate list with exact
    distances, so pin BOTH: raw recall@10 has a floor, and
    overfetch(50)->exact-rerank recovers >= 8/10."""
    from real_time_data_anomaly_detection_spark.operators import REGISTRY

    e = _emb(spark)
    books = pq_train(e, m=16, k=64)
    probe = np.asarray(
        e.filter("vec_id = 0").select("embedding").head()[0], dtype=np.float64
    )
    enc = pq_encode(e.filter("vec_id != 0"), books)
    exact = [r.vec_id for r in REGISTRY["q_cosine_topk"].spark_fn(spark, SF_DIR).collect()]

    approx10 = {r.vec_id for r in pq_adc_topk(enc, books, probe, n_results=10).collect()}
    assert len(approx10 & set(exact)) >= 4, f"raw recall {len(approx10 & set(exact))}/10"

    cand = [r.vec_id for r in pq_adc_topk(enc, books, probe, n_results=50).collect()]
    X = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in e.filter(e.vec_id.isin(cand)).collect()
    }
    p = probe / np.linalg.norm(probe)
    rerank = sorted(cand, key=lambda i: -float(X[i] @ p / np.linalg.norm(X[i])))[:10]
    assert len(set(rerank) & set(exact)) >= 8, f"rerank recall {len(set(rerank) & set(exact))}/10"


def test_ivfpq_index_and_probe(spark, tmp_path):
    """IVF-PQ end-to-end: residual-coded index on disk, partition-
    pruned ADC probe, exact refine. With EVERY cell probed the
    refined top-10 must recover >=9/10 of the exact ranking (only ADC
    overfetch can lose one); at nprobe=6/16 the floor is 5/10 on this
    isotropic fixture (pruning, not PQ, is the binding error). The
    probed scan reads only the probed cell files."""
    from pyspark.sql import functions as F

    from real_time_data_anomaly_detection_spark.operators import REGISTRY
    from real_time_data_anomaly_detection_spark.operators.quantization import (
        build_ivfpq_index,
        ivfpq_probe,
    )

    e = _emb(spark).filter("vec_id != 0")
    probe = np.asarray(
        _emb(spark).filter("vec_id = 0").select("embedding").head()[0],
        dtype=np.float64,
    )
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(e, path, n_cells=16, m=16, k_codes=64)
    exact = [r.vec_id for r in REGISTRY["q_cosine_topk"].spark_fn(spark, SF_DIR).collect()]

    full = ivfpq_probe(spark, path, probe, refine_with=e, nprobe=16)
    assert len({r.vec_id for r in full.collect()} & set(exact)) >= 9

    pruned = ivfpq_probe(spark, path, probe, refine_with=e, nprobe=6)
    assert len({r.vec_id for r in pruned.collect()} & set(exact)) >= 5

    # partition pruning is real on the ADC candidate scan
    cand = (
        spark.read.parquet(path + "/vectors")
        .filter(F.col("cell").isin([0, 1, 2]))
        .select("vec_id")
    )
    cand.collect()
    node = cand._jdf.queryExecution().executedPlan()
    while node.children().length() > 0:
        node = node.children().apply(0)
    n_files = int(node.metrics().apply("numFiles").value())
    assert n_files <= 3, f"scan read {n_files} files; expected <= 3 probed cells"

    # index is genuinely small: codes are m ints per vector, no raw vectors
    enc = spark.read.parquet(path + "/vectors")
    r0 = enc.head()
    assert len(r0.codes) == 16 and "embedding" not in enc.columns
