"""Hypothesis property tests over the pure-python kernels and the
as-of join (vs a brute-force reference implementation)."""

from __future__ import annotations

import datetime

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_data_anomaly_detection_spark.functions.iforest import IsolationForest

matrices = st.integers(60, 200).flatmap(
    lambda n: st.integers(1, 5).flatmap(
        lambda d: st.lists(
            st.lists(
                st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
                min_size=d,
                max_size=d,
            ),
            min_size=n,
            max_size=n,
        )
    )
)


@settings(max_examples=15, deadline=None)
@given(matrices)
def test_iforest_labels_and_contamination_bound(rows):
    X = np.array(rows)
    labels = IsolationForest(contamination=0.05, random_state=42).fit_predict(X)
    assert set(labels) <= {-1, 1}
    n_out = int((labels == -1).sum())
    # at most ~contamination·n flagged (+1 for the tie-forcing rule),
    # and at least one when data is non-constant
    assert n_out <= int(0.05 * len(X)) + 1
    if not np.allclose(X, X[0]):
        assert n_out >= 1


@settings(max_examples=15, deadline=None)
@given(matrices)
def test_iforest_scores_bounded_and_deterministic(rows):
    X = np.array(rows)
    m = IsolationForest(random_state=7).fit(X)
    s1, s2 = m.score_samples(X), m.score_samples(X)
    assert np.array_equal(s1, s2)
    assert (s1 > 0).all() and (s1 <= 1.0).all()


# --- as-of join vs brute force -------------------------------------------

events = st.lists(
    st.tuples(
        st.integers(0, 3),  # user
        st.integers(0, 10_000),  # seconds offset
        st.booleans(),  # left side?
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=10, deadline=None)
@given(events)
def test_asof_join_matches_bruteforce(spark, rows):
    from real_time_data_anomaly_detection_spark.operators.asof import asof_join

    base = datetime.datetime(2024, 1, 1)
    recs = [
        (i, u, base + datetime.timedelta(seconds=s), is_left)
        for i, (u, s, is_left) in enumerate(rows)
    ]
    left = [(i, u, ts) for i, u, ts, is_l in recs if is_l]
    right = [(i, u, ts) for i, u, ts, is_l in recs if not is_l]
    if not left or not right:
        return
    ldf = spark.createDataFrame(left, "event_id long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(right, "event_id long, user_id long, ts timestamp")
    got = {
        r.event_id: r.asof_event_id
        for r in asof_join(ldf, rdf, on="ts", by=["user_id"], value_cols=["event_id"]).collect()
    }
    for lid, lu, lts in left:
        cands = [(ts, i) for i, u, ts in right if u == lu and ts <= lts]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, (lid, got[lid], want)


def test_asof_join_null_value_col_not_stitched(spark):
    """A matched right row with a NULL value column must propagate AS A
    WHOLE (NULL included) — per-column last(ignorenulls) would stitch
    the NULL field from an older row, pairing values that never
    co-occurred."""
    import datetime

    from pyspark.sql import functions as F

    from real_time_data_anomaly_detection_spark.operators.asof import asof_join

    base = datetime.datetime(2024, 1, 1)
    ts = lambda s: base + datetime.timedelta(seconds=s)  # noqa: E731
    rdf = spark.createDataFrame(
        [(1, ts(1), 10, "x"), (1, ts(2), None, "y")],
        "user_id long, ts timestamp, a int, b string",
    )
    ldf = spark.createDataFrame([(99, 1, ts(3))], "event_id long, user_id long, ts timestamp")
    row = asof_join(
        ldf, rdf, on="ts", by=["user_id"], value_cols=["a", "b"]
    ).head()
    assert row.asof_b == "y" and row.asof_ts == ts(2)
    assert row.asof_a is None, "NULL a must come from the ts=2 row, not ts=1"


def _gif_lzw_encode(min_code_size: int, seq: list[int]) -> bytes:
    """Reference GIF-LZW COMPRESSOR (greedy longest-match, width
    growth at table-full, 12-bit cap with explicit clear) — the real
    algorithm, so the decoder property test covers dictionary hits,
    the KwKwK case, and width changes, not just literal streams."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out_codes: list[tuple[int, int]] = []  # (code, width-at-emit)

    def reset():
        return {(i,): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    out_codes.append((clear, width))
    buf: tuple[int, ...] = ()
    for s in seq:
        cand = buf + (s,)
        if cand in table:
            buf = cand
            continue
        out_codes.append((table[buf], width))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == (1 << 12):  # table full: clear
            out_codes.append((clear, width))
            table, next_code, width = reset()
        buf = (s,)
    if buf:
        out_codes.append((table[buf], width))
    out_codes.append((eoi, width))
    acc, nbits, bs = 0, 0, bytearray()
    for code, w in out_codes:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            bs.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        bs.append(acc & 0xFF)
    return bytes(bs)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(2, 8).flatmap(
        lambda mcs: st.tuples(
            st.just(mcs),
            st.lists(st.integers(0, (1 << mcs) - 1), min_size=1, max_size=4000),
        )
    )
)
def test_gif_lzw_decode_inverts_reference_compressor(case):
    from real_time_data_anomaly_detection_spark.operators.multimodal import (
        _gif_lzw_decode,
    )

    mcs, seq = case
    assert _gif_lzw_decode(mcs, _gif_lzw_encode(mcs, seq)) == seq


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 8),
    st.integers(1, 8),
    st.sampled_from([1, 2, 3, 4]),
    st.integers(0, 2**32 - 1),
)
def test_png_filter_round_trip(h, w, c, seed):
    """Forward-filter (test encoder) then unfilter (engine decoder)
    must reproduce the exact pixels for every filter type mix."""
    from real_time_data_anomaly_detection_spark.operators.multimodal import (
        _png_unfilter,
    )
    from tests.test_multimodal import _png_bytes
    import zlib

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    filters = rng.integers(0, 5, size=h).tolist()
    payload = _png_bytes(px, filters=filters)
    # pull the IDAT back out and unfilter it directly
    pos, idat = 8, b""
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    recon = _png_unfilter(raw, h, w * c, c)
    assert recon is not None
    assert np.array_equal(
        recon.reshape(h, w, c).astype(np.uint8), px
    )
