"""Streaming time-series rollups: the online twins of
operators/timeseries.py batch operators.

Same discipline as streaming/anomaly.cusum_stream: bounded integer
state per key, a fold whose published values are BIT-EQUAL to the
batch operator over the stream-so-far (pinned in
tests/test_streaming.py), and quantization done JVM-side with the
identical expressions as the batch path so no Python re-round can
disagree on half-boundary doubles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ohlc_stream(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bar_seconds: int = 900,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Streaming OHLC bars: the online twin of
    operators/timeseries.ohlc_bars — per (key, fixed time bar) the
    opening, highest, lowest and closing value in exact binary
    micro-units plus tick count and sum, re-emitted every trigger as
    ticks arrive.

    State per (key, bar) is EIGHT BIGINTs — (open_ts, open_u,
    close_ts, close_u, high_u, low_u, n, sum) — independent of tick
    volume, the natural-rollup payoff: OHLC is a commutative fold
    over the tick multiset (min/max under the (ts, v_u) total order,
    plus monoid count/sum/min/max), so micro-batches may arrive in
    ANY order across triggers and the final-trigger row is still
    bit-equal to the batch operator over the full replay (pinned in
    tests/test_streaming.py::test_ohlc_stream_equals_batch). The only
    non-idempotent pieces are n/sum — at-least-once re-delivery
    inflates those two, never open/high/low/close.

    Quantization and bar assignment are JVM-side with the batch
    path's exact expressions: v_u = floor(value * 2^20) (IEEE-exact
    power-of-two multiply) and bar = tz-free whole-epoch-seconds
    ``div`` bar width built from date/time fields, so stream and
    batch bucket and quantize identically by construction. Open/close
    ride the (ts, v_u) total order — deterministic under duplicate
    timestamps, the same tiebreak as batch.

    Emission is append-mode: one row per (key, bar, trigger-with-
    data); consumers wanting the latest take the max-n row per
    (key, bar). State never expires under the default NoTimeout;
    pass a processing-time timeout to reap closed bars in
    high-cardinality deployments (a bar older than the reap horizon
    has stopped receiving ticks in any FIFO feed).
    """
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType(), False),
            T.StructField("bar", T.LongType(), False),
            T.StructField("open_u", T.LongType(), False),
            T.StructField("high_u", T.LongType(), False),
            T.StructField("low_u", T.LongType(), False),
            T.StructField("close_u", T.LongType(), False),
            T.StructField("n_ticks", T.LongType(), False),
            T.StructField("sum_u", T.LongType(), False),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("open_ts", T.LongType(), False),
            T.StructField("open_u", T.LongType(), False),
            T.StructField("close_ts", T.LongType(), False),
            T.StructField("close_u", T.LongType(), False),
            T.StructField("high_u", T.LongType(), False),
            T.StructField("low_u", T.LongType(), False),
            T.StructField("n", T.LongType(), False),
            T.StructField("sum", T.LongType(), False),
        ]
    )

    def _update(key, pdf_iter: Iterator[pd.DataFrame], state):
        kv, bar = key[0], key[1]
        chunks = [p for p in pdf_iter if len(p)]
        if not chunks:
            if state.exists:
                state.update(tuple(state.get))
            return
        pdf = pd.concat(chunks, ignore_index=True)
        # (ts, v_u) total order — identical tiebreak to the batch
        # window's orderBy("_ts", "v_u").
        pdf = pdf.sort_values(["_tsu", "v_u"], kind="mergesort")
        tsu = pdf["_tsu"].to_numpy()
        vu = pdf["v_u"].to_numpy()
        b_open_ts, b_open = int(tsu[0]), int(vu[0])
        b_close_ts, b_close = int(tsu[-1]), int(vu[-1])
        b_high, b_low = int(vu.max()), int(vu.min())
        b_n, b_sum = len(pdf), int(vu.sum())
        if state.exists:
            (o_ts, o_u, c_ts, c_u, hi, lo, n, sm) = state.get
            if (b_open_ts, b_open) < (o_ts, o_u):
                o_ts, o_u = b_open_ts, b_open
            if (b_close_ts, b_close) > (c_ts, c_u):
                c_ts, c_u = b_close_ts, b_close
            hi, lo = max(hi, b_high), min(lo, b_low)
            n, sm = n + b_n, sm + b_sum
        else:
            o_ts, o_u = b_open_ts, b_open
            c_ts, c_u = b_close_ts, b_close
            hi, lo, n, sm = b_high, b_low, b_n, b_sum
        state.update((o_ts, o_u, c_ts, c_u, hi, lo, n, sm))
        yield pd.DataFrame(
            {
                key_col: [kv],
                "bar": [int(bar)],
                "open_u": [o_u],
                "high_u": [hi],
                "low_u": [lo],
                "close_u": [c_u],
                "n_ticks": [n],
                "sum_u": [sm],
            }
        )

    prepared = df.select(
        F.col(key_col),
        F.expr(
            f"(datediff(to_date({ts_col}), date'1970-01-01') * 86400"
            f" + hour({ts_col}) * 3600 + minute({ts_col}) * 60"
            f" + second({ts_col})) div {bar_seconds}"
        ).alias("bar"),
        # total-order key: epoch micros (a constant tz shift cannot
        # reorder timestamps; only comparisons are used, never the
        # value itself)
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_tsu"),
        F.floor(F.col(value_col) * F.lit(1048576))
        .cast("bigint")
        .alias("v_u"),
    )
    return prepared.groupBy(key_col, "bar").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )
