"""Drift-stream state ladder: per-run cost of drift_report_stream as
the current window's DISTINCT-VALUE count grows, raw vs bucket_edges
(round-12, VERDICT r11 #3 — the documented state bound said "state
approaches stream length on wide continuous domains; pre-bucket
upstream"; bucket_edges is now the in-operator valve and this measures
what it buys).

Per tier N (distinct micro-unit values in both windows): a frozen
reference of N distinct values, a 3-file feed streaming 3·N rows with
N distinct values, one availableNow run (3 triggers) through
drift_report_stream in two variants sharing one interleaved min-of-3
loop (the stress.py stall-dodging discipline):

  raw:       state = per-(key, distinct value) counts — O(N) blob
             decoded + re-encoded per trigger
  bucketed:  bucket_edges=8 — state O(keys·8) regardless of N

The published statistics differ BY CONTRACT (bucketed variant); the
measured quantity is the fold's wall cost, which is what the state
bound threatens.

Usage: python tools/drift_state_ladder.py [tiers...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

TIERS = (1_000, 10_000, 100_000)


def _fixture(n_distinct: int):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(12)
    vals = np.arange(n_distinct, dtype="int64") * 7  # spread domain
    ref = pd.DataFrame(
        {
            "event_type": "k",
            "xm": vals,
            "d1": rng.integers(1, 4, n_distinct).astype("int64"),
        }
    )
    cur = pd.DataFrame(
        {
            "event_type": "k",
            "xm": np.tile(vals, 3) + 3,  # shifted current window
        }
    )
    return ref, cur


def _run_once(spark, ref, cur, tmp, tag, bucket_edges):
    from pyspark.sql import functions as F  # noqa: F401

    from real_time_data_anomaly_detection_spark.streaming.sketches import (
        drift_report_stream,
    )
    from real_time_data_anomaly_detection_spark.streaming.source import (
        file_replay_source,
    )

    feed = os.path.join(tmp, f"feed_{tag}")
    os.makedirs(feed, exist_ok=True)
    n = len(cur)
    for i in range(3):
        f = os.path.join(feed, f"part-{i:02d}.parquet")
        if not os.path.exists(f):
            cur.iloc[i * n // 3:(i + 1) * n // 3].to_parquet(f, index=False)
            os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))
    ckpt = tempfile.mkdtemp(prefix=f"drift_ladder_ckpt_{tag}_")
    try:
        stream_df = file_replay_source(
            spark, feed, spark.read.parquet(feed).schema
        )
        t0 = time.time()
        q = (
            drift_report_stream(stream_df, ref, bucket_edges=bucket_edges)
            .writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "stream did not finish"
        return time.time() - t0
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> None:
    from real_time_data_anomaly_detection_spark.session import get_spark

    tiers = tuple(int(a) for a in sys.argv[1:]) or TIERS
    spark = get_spark(app_name="drift_state_ladder", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="drift_ladder_")
    try:
        fixtures = {n: _fixture(n) for n in tiers}
        # warm both variants at the smallest tier
        ref, cur = fixtures[tiers[0]]
        _run_once(spark, ref, cur, tmp, f"warm_{tiers[0]}", None)
        _run_once(spark, ref, cur, tmp, f"warmb_{tiers[0]}", 8)
        results: dict[tuple[int, str], list[float]] = {}
        for r in range(3):  # interleaved min-of-3
            for n in tiers:
                ref, cur = fixtures[n]
                results.setdefault((n, "raw"), []).append(
                    _run_once(spark, ref, cur, tmp, f"{n}_raw_{r}", None)
                )
                results.setdefault((n, "bucketed"), []).append(
                    _run_once(spark, ref, cur, tmp, f"{n}_b8_{r}", 8)
                )
        print(f"{'distinct N':>12} {'raw run':>10} {'bucketed-8 run':>15}")
        for n in tiers:
            raw = min(results[(n, "raw")])
            b = min(results[(n, "bucketed")])
            print(f"{n:>12} {raw:>9.2f}s {b:>14.2f}s")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
