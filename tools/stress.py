"""Local stress run: operator throughput well beyond the sf0.1 bench.

Generates N-row synthetic facts in-engine (spark.range + expressions —
no disk), then times the core shuffle-bearing operator shapes. Not part
of the per-round bench; run manually:

    python tools/stress.py [rows]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    from pyspark.sql import functions as F

    from real_time_data_anomaly_detection_spark.session import get_spark

    spark = get_spark(app_name="stress")

    fact = (
        spark.range(rows, numPartitions=64)
        .select(
            F.col("id"),
            (F.col("id") % 1_000_000).alias("k"),
            (F.col("id") % 97).alias("grp"),
            (F.rand(1) * 100).alias("v"),
            F.timestamp_micros((F.col("id") * 1000) % 100_000_000_000).alias("ts"),
        )
    )
    dim = spark.range(1_000_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("tag")
    )

    def t(label, df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        print(f"{label:34s} {dt:6.2f}s  ({rows/dt/1e6:6.1f}M rows/s)")

    t("scan+project+filter", fact.filter(F.col("v") > 50).select("id", "v"))
    t(
        "groupBy agg (97 groups)",
        fact.groupBy("grp").agg(F.sum("v"), F.avg("v"), F.count(F.lit(1))),
    )
    t(
        "groupBy agg (1M groups)",
        fact.groupBy("k").agg(F.sum("v").alias("s")),
    )
    t(
        "shuffle join fact⋈dim (1M keys)",
        fact.join(dim, "k").select("id", "tag"),
    )
    from pyspark.sql import Window as W

    t(
        "window row_number (97 parts)",
        fact.withColumn(
            "rn", F.row_number().over(W.partitionBy("grp").orderBy("ts", "id"))
        ),
    )
    t("top-100 of N", fact.orderBy(F.desc("v"), F.asc("id")).limit(100))

    # Blocked-GEMM exact all-pairs cosine: n_vec vectors -> n_vec²/2
    # pair evaluations (the honest unit for this shape is pairs/s, not
    # rows/s). In-engine synthetic 64-dim vectors, seeded.
    from real_time_data_anomaly_detection_spark.operators.dedup import (
        embed_neardup_pairs,
    )

    n_vec = max(10_000, rows // 400)
    vecs = spark.range(n_vec, numPartitions=32).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: F.sin(F.col("id") * 0.7 + i * 1.3),
        ).alias("embedding"),
    )
    t0 = time.time()
    embed_neardup_pairs(vecs, threshold=0.99).write.format("noop").mode(
        "overwrite"
    ).save()
    dt = time.time() - t0
    pairs = n_vec * (n_vec - 1) / 2
    print(
        f"{'embed blocked GEMM (%dk vecs)' % (n_vec // 1000):34s} {dt:6.2f}s  "
        f"({pairs/dt/1e6:6.1f}M pairs/s)"
    )


    # MinHash-LSH near-dup at corpus scale: synthetic documents as
    # sliding windows over a virtual token stream (doc i and i±1 share
    # ~57% of tokens -> genuine near-dup structure, pair count ~ N).
    from real_time_data_anomaly_detection_spark.operators.dedup import (
        minhash_neardup_pairs,
    )

    # Unbounded token stream (NO modulo): a modulo vocabulary makes
    # docs one period apart exact duplicates, whose m-sized identical
    # groups cost m² candidate pairs — the boilerplate hazard
    # max_bucket_size exists for, but an artifact here, not the
    # linear-path measurement this stage is about.
    n_doc = max(10_000, rows // 100)
    docs = spark.range(n_doc, numPartitions=64).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(34)),
                lambda j: F.concat(
                    F.lit("w"), (F.col("id") * 15 + j).cast("string")
                ),
            ),
        ).alias("text"),
    )
    # Warm first: the 32-signature projection compiles a large codegen
    # method whose JIT cost dwarfs a cold first run.
    minhash_neardup_pairs(docs.limit(20_000), threshold=0.3).write.format(
        "noop"
    ).mode("overwrite").save()
    t0 = time.time()
    minhash_neardup_pairs(docs, threshold=0.3).write.format("noop").mode(
        "overwrite"
    ).save()
    dt = time.time() - t0
    print(
        f"{'minhash near-dup (%dk docs)' % (n_doc // 1000):34s} {dt:6.2f}s  "
        f"({n_doc/dt/1e3:6.1f}k docs/s)"
    )


if __name__ == "__main__":
    main()
