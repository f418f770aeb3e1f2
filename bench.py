"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized via a noop sink (no driver collect, no
short-circuit count) — the number is end-to-end plan execution time.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family, weighted toward shuffle-heavy
# shapes (joins, aggs, windows) where scale behavior is decided.
HEADLINE = [
    "q_agg_group",
    "q_join_inner",
    "q_join_3way",
    "q_tpch_q3",
    "q_tpch_q10",
    "q_window_rank",
    "q_window_tumbling_batch",
    "q_topk",
    "q_json_get",
    "q_asof_join",
    "q_dedup_exact",
    "q_text_tokens",
    "q_cosine_topk",
    "q_embed_neardup",
    "q_minhash_neardup",
]


def _run(fn, spark, sf_dir) -> None:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()


def _median3(fn, spark, sf_dir) -> tuple[float, float]:
    """(median, spread) of 3 timed runs. Spread = max - min.

    Single-shot timings chased noise across rounds (an identical
    0-exchange broadcast plan swung 0.44 -> 1.94 -> 0.59 s); median-of-3
    makes round-over-round comparison meaningful.
    """
    times = []
    for _ in range(3):
        t0 = time.time()
        _run(fn, spark, sf_dir)
        times.append(time.time() - t0)
    times.sort()
    return round(times[1], 3), round(times[2] - times[0], 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from real_time_data_anomaly_detection_spark.operators import REGISTRY
    from real_time_data_anomaly_detection_spark.session import get_spark

    spark = get_spark(app_name="bench")

    # Streaming throughput FIRST: its teardown writes noisy stderr
    # (state-store/task aborts under load) that round 2 showed can
    # interleave with — and once drowned — the final metric line.
    # Measuring it before any batch timing keeps the tail of stdout
    # clean and keeps leftover streaming state out of batch numbers.
    stream_rps = None
    if os.environ.get("SPARK_GRAFT_BENCH_STREAM", "1") == "1":
        try:
            stream_rps = _stream_throughput(spark)
        except Exception as exc:  # never let the stream kill the metric line
            print(f"stream bench failed: {exc!r}", file=sys.stderr)

    # Warm-up pass: JIT/codegen compilation + parquet footer reads are
    # one-time costs a long-lived engine doesn't pay per query; timings
    # below measure steady-state execution.
    for name in HEADLINE:
        _run(REGISTRY[name].spark_fn, spark, sf_dir)

    per_query: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in HEADLINE:
        per_query[name], spread[name] = _median3(
            REGISTRY[name].spark_fn, spark, sf_dir
        )

    # Round-2/round-4 additions, reported separately so the headline
    # total stays comparable across rounds.
    EXTENDED = [
        "q_tpch_q6",
        "q_tpch_q18",
        "q_corpus_clean",
        "q_ann_batch",
        "q_tpch_q9",
        "q_tpch_q21",
        "q_decontaminate",
        "q_pack_sequences",
        "q_resample_ffill",
    ]
    extended: dict[str, float] = {}
    for name in EXTENDED:
        fn = REGISTRY[name].spark_fn
        _run(fn, spark, sf_dir)  # warm
        extended[name], _ = _median3(fn, spark, sf_dir)

    total = round(sum(per_query.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extended": extended,
        "spread": spread,
    }
    if stream_rps is not None:
        result["stream_rows_per_sec"] = stream_rps

    # The metric line is the LAST stdout write, after all Spark jobs
    # (batch and stream) have finished — nothing can interleave with it.
    sys.stdout.flush()
    print(json.dumps(result), flush=True)


def _stream_throughput(spark, min_rated_batches: int = 5, timeout: float = 90.0) -> float:
    from real_time_data_anomaly_detection_spark.streaming.generator import (
        energy_rate_stream,
    )
    from real_time_data_anomaly_detection_spark.streaming.pipeline import (
        run_detection_pipeline,
    )
    from real_time_data_anomaly_detection_spark.streaming.sinks import stop_gracefully

    # 4 group keys need few state partitions; 32 would spin 32 python
    # workers per trigger for mostly-empty shards.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        # Offer ABOVE the pipeline's measured ceiling (~95k/s on this
        # box) so the recorded number is the processing rate, not the
        # offer rate — a 20k offer was silently capping the metric.
        # (Reference sustains 8 ev/s; its configured cap is 1000/s.)
        q = run_detection_pipeline(
            spark,
            energy_rate_stream(spark, rows_per_second=100_000),
            sink_table="bench_out",
        )
        # Wait for real progress (first trigger pays worker/state
        # spin-up; a fixed sleep under-reports on a loaded host).
        rates: list[float] = []
        deadline = time.time() + timeout
        while time.time() < deadline and len(rates) < min_rated_batches:
            time.sleep(1.0)
            rates = [
                p["processedRowsPerSecond"]
                for p in q.recentProgress
                if p and p.get("processedRowsPerSecond")
            ]
        stop_gracefully(q, timeout_sec=30)
        tail = rates[-5:]
        return round(sum(tail) / max(len(tail), 1), 1)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


if __name__ == "__main__":
    main()
