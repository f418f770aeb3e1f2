"""CLI for the engine.

    python -m real_time_data_anomaly_detection_spark list
    python -m real_time_data_anomaly_detection_spark query q_agg_group [--sf-dir DIR] [--limit N]
    python -m real_time_data_anomaly_detection_spark sql "SELECT ... FROM lineitem ..." [--sf-dir DIR]
    python -m real_time_data_anomaly_detection_spark pipeline [--rate N] [--duration SEC]

`query` runs a declared operator; `sql` opens the full Spark SQL
surface over the fixture tables (registered as views); `pipeline` runs
the live anomaly-detection stream (the reference application end to
end) and prints detected outliers.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="real_time_data_anomaly_detection_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list declared queries")

    qp = sub.add_parser("query", help="run a declared query")
    qp.add_argument("name")
    qp.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    qp.add_argument("--limit", type=int, default=20)
    qp.add_argument("--explain", action="store_true", help="print the physical plan instead of rows")

    sp = sub.add_parser("sql", help="run ad-hoc SQL over the fixture tables")
    sp.add_argument("statement")
    sp.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    sp.add_argument("--limit", type=int, default=20)

    pp = sub.add_parser("pipeline", help="run the live anomaly-detection stream")
    pp.add_argument("--rate", type=int, default=1000, help="events/sec")
    pp.add_argument("--duration", type=float, default=15.0, help="seconds to run")
    pp.add_argument(
        "--watch",
        action="store_true",
        help="poll the outlier table live (the reference dashboard's "
        "read path, reference app/app3_ML.py:324-335, as a terminal tail)",
    )
    pp.add_argument(
        "--poll-interval", type=float, default=2.0, help="watch poll seconds"
    )

    args = p.parse_args(argv)

    from real_time_data_anomaly_detection_spark.operators import REGISTRY

    if args.cmd == "list":
        for name, q in sorted(REGISTRY.items()):
            kind = "oracle" if q.oracle else "rows-only"
            doc = (q.doc or "").strip().splitlines()
            print(f"{name:26s} [{kind}] {doc[0] if doc else ''}")
        return 0

    from real_time_data_anomaly_detection_spark.session import get_spark

    spark = get_spark(app_name=f"cli-{args.cmd}")

    if args.cmd == "query":
        if args.name not in REGISTRY:
            print(f"unknown query {args.name!r}; `list` shows all", file=sys.stderr)
            return 2
        df = REGISTRY[args.name].spark_fn(spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "sql":
        from real_time_data_anomaly_detection_spark.io import register_views

        register_views(spark, args.sf_dir)
        spark.sql(args.statement).show(args.limit, truncate=False)
        return 0

    if args.cmd == "pipeline":
        from real_time_data_anomaly_detection_spark.streaming.generator import (
            energy_rate_stream,
        )
        from real_time_data_anomaly_detection_spark.streaming.pipeline import (
            run_detection_pipeline,
        )
        from real_time_data_anomaly_detection_spark.streaming.sinks import (
            stop_gracefully,
        )

        q = run_detection_pipeline(
            spark, energy_rate_stream(spark, rows_per_second=args.rate)
        )
        print(f"pipeline running at {args.rate} ev/s for {args.duration}s ...")
        if args.watch:
            # Live read path: poll the queryable memory sink and print
            # newly appended outliers — what the reference's Dash
            # callback does against its locked driver dict, but over a
            # real streaming sink any SQL client could also query.
            # New rows are tracked by a timestamp high-water mark plus
            # a seen-set at the frontier (NOT positional slicing of a
            # sorted collect, which reprints/skips on out-of-order
            # events), and each poll only collects rows at/past the
            # mark — bounded work even on hour-long runs.
            from pyspark.sql import functions as F

            deadline = time.time() + args.duration
            hwm = None
            frontier: set = set()
            while time.time() < deadline:
                time.sleep(min(args.poll_interval, max(deadline - time.time(), 0.1)))
                tbl = spark.table("outliers")
                if hwm is not None:
                    tbl = tbl.filter(F.col("timestamp") >= hwm)
                rows = tbl.orderBy("timestamp").collect()
                for r in rows:
                    key = (r.timestamp, r.plant_type, r.region)
                    if key in frontier:
                        continue
                    frontier.add(key)
                    print(
                        f"  [{r.timestamp}] {r.plant_type}/{r.region} "
                        f"power={r.power_output:.2f} demand={r.demand:.2f} "
                        f"score={r.score:.4f}"
                    )
                if rows:
                    hwm = max(r.timestamp for r in rows)
                    frontier = {k for k in frontier if k[0] >= hwm}
        else:
            time.sleep(args.duration)
        stop_gracefully(q, timeout_sec=30)
        out = spark.table("outliers")
        n = out.count()
        print(f"{n} outliers detected:")
        out.select("timestamp", "plant_type", "region", "power_output", "demand", "score").orderBy(
            "timestamp", ascending=False
        ).show(10, truncate=False)
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
