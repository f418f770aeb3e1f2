"""Deduplication operators for LLM training-data pipelines.

Four families, all shuffle-conscious:

- exact: hash-groupBy on sha2(text) — the shuffle carries 32-byte
  digests, never documents.
- n-gram Jaccard (exact near-dup): shingle → inverted-index self-join →
  intersection counts. O(sum of shingle-postings²) — the exact
  baseline the approximate methods are validated against.
- MinHash + LSH banding: k seeded xxhash64 min-signatures, banded into
  b buckets; candidate pairs only where a band collides. The 100 TB
  path: cost ~ O(n·k) + collision joins, no n² term.
- SimHash: 64-bit weighted-bit-vote fingerprint; near-dups = small
  Hamming distance. One explode + two aggregations, all JVM-side.

Declared queries (registry): q_ngram_jaccard + q_embed_neardup carry
DuckDB oracles; q_minhash_neardup + q_simhash_pairs are deterministic
but not SQL-expressible → rows-only checks + unit tests vs the exact
Jaccard baseline (tests/test_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.functions.vector import cosine_similarity
from real_time_data_anomaly_detection_spark.io import load_table
from real_time_data_anomaly_detection_spark.operators.registry import query


def exact_dedup(df: DataFrame, cols: list[str], keep_col: str) -> DataFrame:
    """Keep one row per distinct ``cols`` content (lowest ``keep_col``).

    Dedups on sha2-256 of the content so the exchange hashes/compares
    32-byte keys; deterministic winner via min(keep_col), unlike
    dropDuplicates whose survivor depends on partition order.
    """
    fingerprint = F.sha2(F.concat_ws("\x1f", *cols), 256)
    # row_number (not min-join-back): a min-join keeps EVERY row tied
    # on the minimum keep_col, violating the one-survivor contract.
    # Remaining columns break keep_col ties deterministically.
    order_cols = [F.col(keep_col).asc()] + [
        F.col(c).asc_nulls_first() for c in df.columns if c != keep_col
    ]
    w = Window.partitionBy("_fp").orderBy(*order_cols)
    return (
        df.withColumn("_fp", fingerprint)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct n-token shingles per document: (id, shingle)."""
    # Single-file sources scan as one task; spread docs before the
    # explode so shingling/hashing parallelizes.
    toks = df.repartition(32, id_col).select(
        id_col, F.split(F.col(text_col), " ").alias("t")
    )
    idx = F.sequence(F.lit(0), F.size("t") - n)
    shingle = lambda i: F.concat_ws(" ", *[F.element_at("t", i + j + 1) for j in range(n)])  # noqa: E731
    return (
        toks.filter(F.size("t") >= n)
        .select(id_col, F.explode(F.transform(idx, lambda i: shingle(i))).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    sh: DataFrame, id_col: str = "doc_id", threshold: float = 0.05
) -> DataFrame:
    """Exact Jaccard-similar pairs from a (id, shingle) relation.

    Inverted-index self-join: pairs only materialize for shared
    shingles. Hot shingles (stop-shingles) blow this up at scale —
    the MinHash path below is the remedy; this is the exact oracle.
    """
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    j = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(j >= threshold)
        .select("doc_a", "doc_b", F.round(j, 4).alias("jaccard"))
    )


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", num_hashes: int = 32
) -> DataFrame:
    """k min-hash values per doc: (id, sig array<bigint>).

    h_i(s) = xxhash64(shingle, seed=i); sig[i] = min over shingles.
    One groupBy, k JVM-side hash evaluations per shingle — no UDFs.
    """
    aggs = [
        F.min(F.xxhash64("shingle", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)
    ]
    per_doc = sh.groupBy(id_col).agg(*aggs)
    return per_doc.select(
        id_col, F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(
    sigs: DataFrame, id_col: str = "doc_id", bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: docs colliding in ≥1 band → candidate pairs.

    Band key = hash of r consecutive signature slots. P(collide) =
    1-(1-j^r)^b — the standard S-curve; (b=8, r=4) centers ~j≈0.6.
    """
    band_ids = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = sigs.select(
        id_col,
        F.explode(band_ids).alias("band"),
        F.col("sig"),
    ).select(
        id_col,
        "band",
        F.xxhash64(
            "band", F.concat_ws(",", F.slice("sig", F.col("band") * rows_per_band + 1, rows_per_band))
        ).alias("band_key"),
    )
    a = banded.select(F.col(id_col).alias("doc_a"), "band", "band_key")
    b = banded.select(F.col(id_col).alias("doc_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def verify_candidates(
    cands: DataFrame, sh: DataFrame, id_col: str = "doc_id", threshold: float = 0.05
) -> DataFrame:
    """Exact Jaccard computed ONLY for candidate pairs.

    Intersections come from candidates ⋈ shingles_a ⋈ shingles_b on
    (doc ids, equal shingle) — cost scales with candidate count, not
    with all-pairs. This is what makes LSH generate-and-verify cheaper
    than the exact join at scale."""
    a = sh.select(F.col(id_col).alias("doc_a"), F.col("shingle").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("_doc_b"), F.col("shingle").alias("sh_b"))
    inter = (
        cands.join(a, "doc_a")
        .join(b, (F.col("doc_b") == F.col("_doc_b")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    j = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(j >= threshold)
        .select("doc_a", "doc_b", F.round(j, 4).alias("jaccard"))
    )


def minhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.05,
) -> DataFrame:
    """MinHash-LSH candidates verified with exact Jaccard — the
    standard generate-and-verify near-dup pipeline. Verification cost
    scales with the candidate set (verify_candidates), never all-pairs.

    The shingle relation feeds four subplans; recomputing the
    tokenize+explode chain per branch measured FASTER than persist()
    here (cache materialization cost > recompute for this light chain),
    so no caching."""
    sh = shingles(df, text_col, id_col, n)
    cands = minhash_lsh_candidates(
        minhash_signatures(sh, id_col, num_hashes), id_col, bands, num_hashes // bands
    )
    return verify_candidates(cands, sh, id_col, threshold)


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document, entirely with built-in expressions.

    Each distinct token hashes to 64 bits; every bit votes ±1; the
    fingerprint's bit is 1 where the vote sum is positive. Explode is
    tokens×64 rows — linear, shuffle-free until one groupBy."""
    df = df.repartition(32, id_col)  # parallelize single-file sources
    toks = df.select(
        id_col, F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    bits = toks.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"),
        F.col("h"),
    ).select(
        id_col,
        "bit",
        # vote +1 if bit set else -1 (expr: DSL shiftright needs a
        # literal shift amount, SQL form accepts a column)
        F.expr("(shiftright(h, bit) & 1) * 2 - 1").alias("vote"),
    )
    votes = bits.groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    return votes.groupBy(id_col).agg(
        F.sum(
            F.expr(
                "CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), bit) "
                "ELSE CAST(0 AS BIGINT) END"
            )
        ).alias("simhash")
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
) -> DataFrame:
    """Pairs whose SimHash Hamming distance ≤ max_hamming.

    Self-join is banded on the fingerprint's four 16-bit chunks
    (pigeonhole: distance ≤ max_hamming with 4 bands guarantees one
    identical chunk when max_hamming < 4) — at scale this avoids the
    n² comparison just like MinHash banding."""
    fps = simhash_fingerprints(df, text_col, id_col)
    chunk = lambda c, i: F.shiftright(F.col(c), i * 16).bitwiseAND(F.lit(0xFFFF))  # noqa: E731
    banded = fps.select(
        id_col,
        "simhash",
        F.explode(F.array(*[F.struct(F.lit(i).alias("band"), chunk("simhash", i).alias("key")) for i in range(4)])).alias(
            "bk"
        ),
    ).select(id_col, "simhash", "bk.band", "bk.key")
    a = banded.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"), "band", "key"
    )
    b = banded.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"), "band", "key"
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Declared queries
# ---------------------------------------------------------------------------


@query(
    "q_ngram_jaccard",
    oracle="""
        WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
               FROM toks, UNNEST(generate_series(1, len(t)-2)) AS u(i)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT doc_a, doc_b,
               round(inter::DOUBLE/(na.n + nb.n - inter), 4) AS jaccard
        FROM pairs
        JOIN sizes na ON doc_a = na.doc_id
        JOIN sizes nb ON doc_b = nb.doc_id
        WHERE inter::DOUBLE/(na.n + nb.n - inter) >= 0.05
    """,
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.05)."""
    d = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(shingles(d, n=3), threshold=0.05)


@query("q_minhash_neardup")  # deterministic, not SQL-expressible → rows-only
def q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-verified (the scale path for
    q_ngram_jaccard; recall vs the exact pairs tested in
    tests/test_dedup.py)."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_neardup_pairs(d)


@query("q_simhash_pairs")  # deterministic, not SQL-expressible → rows-only
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-distance near-dup pairs (banded self-join)."""
    d = load_table(spark, sf_dir, "documents")
    return simhash_pairs(d, max_hamming=8)


@query(
    "q_embed_neardup",
    oracle="""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 4) AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
    """,
)
def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.4).

    Plan shape: posexplode to (vec_id, pos, component), equi-join on
    ``pos`` with a vec_a < vec_b residual, hash-aggregate the per-pair
    dot products, then attach precomputed norms. Everything is
    codegen'd joins/aggregates — the naive cross join plans a
    BroadcastNestedLoopJoin whose per-pair interpreted higher-order
    cosine made it ~20x slower (and at scale BNLJ is a non-starter).
    similarity.ann_topk holds the LSH-bucketed path that avoids the
    all-pairs term entirely."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    )
    norms = ex.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("norm"))
    # The source is a single parquet file = one input task; repartition
    # the probe side so pair generation + partial agg use every core.
    a = ex.repartition(32, "vec_id").select(
        F.col("vec_id").alias("vec_a"), "pos", F.col("v").alias("va")
    )
    b = ex.select(F.col("vec_id").alias("vec_b"), "pos", F.col("v").alias("vb"))
    # Broadcast the (tiny) exploded right side: the 64-distinct-pos key
    # makes a sort-merge join degenerate (every key matches n_vec rows
    # per side); a broadcast hash join streams the pairs with map-side
    # partial aggregation and no shuffle of the 16M intermediate rows.
    dots = (
        a.join(F.broadcast(b), (a.pos == b.pos) & (F.col("vec_a") < F.col("vec_b")))
        .groupBy("vec_a", "vec_b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    na = norms.select(F.col("vec_id").alias("vec_a"), F.col("norm").alias("na"))
    nb = norms.select(F.col("vec_id").alias("vec_b"), F.col("norm").alias("nb"))
    cos = F.col("dot") / (F.col("na") * F.col("nb"))
    return (
        dots.join(F.broadcast(na), "vec_a")
        .join(F.broadcast(nb), "vec_b")
        .filter(cos >= 0.4)
        .select("vec_a", "vec_b", F.round(cos, 4).alias("cos_sim"))
    )
