"""Compaction ladder: per-trigger admit cost vs accumulated delta
batches, with and without generation compaction (round-11 verdict #5 —
round-10 claimed O(batches-since-compaction) listings; this measures
it).

Builds a text-ingest index (streaming/ingest.py layout: seed +
delta/batch=<k>) with 10 / 100 / 1000 accumulated delta directories,
then times the EXACT per-trigger admit plan ``ingest_stream._process``
runs — ``_index_paths`` resolve + ``spark.read.parquet(*paths)`` +
``ingest_dedup_keys`` against a fixed 1k-doc batch — in two variants
sharing one interleaved min-of-3 loop (the stress.py stall-dodging
discipline):

  uncompacted: seed + D delta dirs  (listing + D parquet footer opens)
  compacted:   one gen=<D> generation (single-dir read)

Also times each ``compact_ingest_index`` fold itself, so the knee
where compaction pays for itself is (fold cost) / (per-trigger
penalty) triggers. The image gate shares the identical layout and
resolver (ingest.py:261 image_ingest_stream) — only the key schema
differs (band/key/id/hash vs _dig/canon_url), so the listing+footer
component measured here transfers 1:1.

Usage: python tools/compaction_ladder.py [seed_docs] [batch_docs]
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

TIERS = (10, 100, 1000)
PER_DELTA = 100  # keys per accumulated micro-batch


def _synth_docs(spark, n, start=0):
    from pyspark.sql import functions as F

    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("https://h"), (F.col("id") % 997).cast("string"),
            F.lit(".example.com/p/"), F.col("id").cast("string"),
        ).alias("url"),
        F.concat(F.lit("text body "), F.md5(F.col("id").cast("string"))).alias(
            "text"
        ),
    )


def _write_deltas(root: str, n_batches: int, start_key: int) -> None:
    """Delta dirs written driver-side (pandas → parquet): the measured
    quantity is the READ path's listing + footer cost, which depends
    only on the on-disk layout, not on who wrote it."""
    import pandas as pd

    k = start_key
    for b in range(n_batches):
        d = os.path.join(root, "delta", f"batch={b}")
        os.makedirs(d, exist_ok=True)
        rows = []
        for i in range(PER_DELTA):
            text = f"delta body {k}"
            url = f"https://d{k % 997}.example.com/q/{k}"
            rows.append(
                (hashlib.sha256(text.encode()).hexdigest(), url)
            )
            k += 1
        pd.DataFrame(rows, columns=["_dig", "canon_url"]).to_parquet(
            os.path.join(d, "part-0.parquet"), index=False
        )


def main() -> None:
    from real_time_data_anomaly_detection_spark.operators.pipeline_ops import (
        ingest_dedup_keys,
    )
    from real_time_data_anomaly_detection_spark.session import get_spark
    from real_time_data_anomaly_detection_spark.streaming.ingest import (
        _index_paths,
        build_ingest_index,
        compact_ingest_index,
    )

    seed_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    batch_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    spark = get_spark(app_name="compaction_ladder")

    work = tempfile.mkdtemp(prefix="compaction_ladder_")
    roots = {}  # (variant, D) -> index root
    try:
        # One root per (variant, tier): generations must not leak into
        # the uncompacted variant's resolver, and a gen=<D> in a shared
        # compacted root would shadow smaller tiers' deltas.
        for d_tier in TIERS:
            for variant in ("unc", "comp"):
                root = os.path.join(work, f"{variant}_{d_tier}")
                build_ingest_index(_synth_docs(spark, seed_docs), root)
                _write_deltas(root, d_tier, start_key=10_000_000)
                roots[(variant, d_tier)] = root

        fold_cost = {}
        for d_tier in TIERS:
            t0 = time.time()
            compact_ingest_index(
                spark, roots[("comp", d_tier)], d_tier, prune=True
            )
            fold_cost[d_tier] = time.time() - t0
            print(
                f"compact fold D={d_tier}: {fold_cost[d_tier]:.2f} s",
                flush=True,
            )

        # fixed admit batch: half fresh, half colliding with the seed
        batch = _synth_docs(spark, batch_docs // 2, start=20_000_000).union(
            _synth_docs(spark, batch_docs - batch_docs // 2, start=0)
        )
        batch = batch.localCheckpoint(eager=True)

        def _trigger(root: str, before_batch: int) -> float:
            t0 = time.time()
            keys = spark.read.parquet(
                *_index_paths(root, before_batch, spark)
            )
            ingest_dedup_keys(keys, batch).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.time() - t0

        cells = [(v, d) for d in TIERS for v in ("unc", "comp")]
        walls: dict[tuple[str, int], list[float]] = {c: [] for c in cells}
        for c in cells:  # warm (JIT + page cache)
            _trigger(roots[c], c[1])
        for rep in range(3):  # tier-interleaved min-of-3
            for c in cells:
                dt = _trigger(roots[c], c[1])
                walls[c].append(dt)
                print(
                    f"rep{rep} {c[0]:4s} D={c[1]:>4}  trigger={dt:6.2f} s",
                    flush=True,
                )

        print("\n| D | uncompacted | compacted | penalty | fold | knee |")
        print("|---|---|---|---|---|---|")
        for d_tier in TIERS:
            u = min(walls[("unc", d_tier)])
            cmp_ = min(walls[("comp", d_tier)])
            pen = u - cmp_
            knee = fold_cost[d_tier] / pen if pen > 0.005 else float("inf")
            print(
                f"| {d_tier} | {u:.2f} s | {cmp_:.2f} s | {pen:+.2f} s "
                f"| {fold_cost[d_tier]:.2f} s | {knee:.0f} triggers |"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
