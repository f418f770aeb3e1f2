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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from real_time_data_anomaly_detection_spark.operators import REGISTRY
    from real_time_data_anomaly_detection_spark.session import get_spark

    spark = get_spark(app_name="bench")

    # Warm-up pass: JIT/codegen compilation + parquet footer reads are
    # one-time costs a long-lived engine doesn't pay per query; timings
    # below measure steady-state execution.
    for name in HEADLINE:
        REGISTRY[name].spark_fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].spark_fn
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        per_query[name] = round(time.time() - t0, 3)

    # Round-2 additions, reported separately so the headline total
    # stays comparable across rounds.
    EXTENDED = ["q_tpch_q6", "q_tpch_q18", "q_corpus_clean", "q_ann_batch"]
    extended: dict[str, float] = {}
    for name in EXTENDED:
        fn = REGISTRY[name].spark_fn
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        extended[name] = round(time.time() - t0, 3)

    total = round(sum(per_query.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extended": extended,
    }

    # Streaming throughput: sustained rows/sec through the full
    # source -> stateful-window -> score -> sink pipeline (reference
    # sustains 8 ev/s, its configured cap is 1000/s — BASELINE.md).
    if os.environ.get("SPARK_GRAFT_BENCH_STREAM", "1") == "1":
        result["stream_rows_per_sec"] = _stream_throughput(spark)

    print(json.dumps(result))


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
