"""Deterministic corpus sharding — the last mile of a training-data
pipeline: split the curated corpus into N shards with a seeded,
partitioning-independent assignment, a deterministic within-shard
order, and an auditable manifest.

Why not `df.repartition(N).write`: Spark's round-robin/hash
repartition gives no cross-run guarantee of which row lands where,
and re-running after a cluster resize silently reshuffles the
training order. Here shard = pmod(xxhash64(id, seed), N) and the
within-shard order is the md5 of the same key — both pure functions
of the row, so ANY engine, cluster size, or retry produces the same
shards byte-for-byte (the same argument as pipeline_ops.hash_sample).

The manifest carries per-shard row counts plus an ORDER-INDEPENDENT
content checksum (sum of per-row 32-bit md5 digests) — cheap to
recompute on the read side to verify a shard survived transport. The
declared query uses the md5 hasher for the shard too, so the ENTIRE
manifest algebra is DuckDB-replayable (the md5-twin discipline);
the xxhash64 fast path keeps dedicated determinism/balance tests.

Scale shape: assignment and sort key are codegen'd expressions; the
write is `repartition(shard)` + `sortWithinPartitions` — one shuffle,
then a streaming sort per shard file. The manifest is a shard-keyed
aggregation (N rows out).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.io import load_table
from real_time_data_anomaly_detection_spark.operators.registry import query


def _order_key(id_col: str, seed: int) -> Column:
    return F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))


def _md5_digest(id_col: str, seed: int) -> Column:
    """32-bit md5 digest of the seeded id — DuckDB-replayable."""
    return F.conv(F.substring(_order_key(id_col, seed), 1, 8), 16, 10).cast("bigint")


def shard_assign(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    seed: int = 42,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Add `shard` (0..N-1) and `sort_key`: both pure functions of the
    id, stable under any partitioning / cluster size / retry.
    ``hasher``: "xxhash64" (fast path) or "md5" (oracle-replayable)."""
    if hasher == "xxhash64":
        shard = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(num_shards))
    elif hasher == "md5":
        shard = F.pmod(_md5_digest(id_col, seed), F.lit(num_shards))
    else:
        raise ValueError(f"unknown hasher {hasher!r}")
    return df.withColumn("shard", shard).withColumn(
        "sort_key", _order_key(id_col, seed)
    )


def shard_manifest(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    seed: int = 42,
    hasher: str = "xxhash64",
) -> DataFrame:
    """(shard, n_docs, checksum): order-independent per-shard content
    checksum = sum of 32-bit md5 digests of the ids."""
    return (
        shard_assign(df, id_col, num_shards, seed, hasher)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(_md5_digest(id_col, seed)).alias("checksum"),
        )
        .orderBy("shard")
    )


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    num_shards: int,
    seed: int = 42,
) -> DataFrame:
    """Write the corpus as `shard=K/` parquet directories, each sorted
    by the deterministic sort key, and return the manifest. One
    shuffle (repartition on shard) + per-partition streaming sort."""
    sharded = shard_assign(df, id_col, num_shards, seed)
    (
        sharded.repartition(num_shards, "shard")
        .sortWithinPartitions("shard", "sort_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return shard_manifest(df, id_col, num_shards, seed)


@query(
    "q_shard_manifest",
    oracle="""
        WITH d AS (
            SELECT ('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       AS dig
            FROM documents)
        SELECT dig % 8 AS shard, count(*) AS n_docs,
               CAST(sum(dig) AS BIGINT) AS checksum
        FROM d GROUP BY 1 ORDER BY 1
    """,
)
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-shard manifest of the documents corpus (md5 hasher so DuckDB
    replays the identical shard assignment AND checksum — the md5-twin
    discipline). The xxhash64 fast path is pinned separately in
    tests/test_sharding.py (determinism, balance, write round-trip)."""
    d = load_table(spark, sf_dir, "documents")
    return shard_manifest(d, "doc_id", 8, hasher="md5")
