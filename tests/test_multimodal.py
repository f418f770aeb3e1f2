"""Multimodal plumbing: schema, Arrow batching, deterministic stub
decode, frame sampling, resize planning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    _decode_payload,
    extract_features,
    resize_plan,
    sample_frames,
)


def _media(spark):
    rows = [
        (0, "image", b"\x89PNGfakebytes", (800, 600, None, None, "png")),
        (1, "image", b"\xff\xd8JPEGfake", (300, 200, None, None, "jpeg")),
        (2, "audio", b"RIFFfakewav", (None, None, 16000, 2500, "pcm")),
        (3, "video", b"\x00\x00ftypmp4", (1920, 1080, None, 3500, "h264")),
        (4, "image", None, (10, 10, None, None, "png")),  # null payload
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_shapes(spark):
    out = extract_features(_media(spark)).collect()
    by_id = {r.media_id: r for r in out}
    assert len(out) == 5
    for i in (0, 1, 2, 3):
        assert len(by_id[i].feature) == FEATURE_DIM
        assert all(0 <= v < 1 for v in by_id[i].feature)
    assert by_id[4].feature is None  # null payload survives as null


def test_features_deterministic_content_addressed(spark):
    a = {r.media_id: r.feature for r in extract_features(_media(spark)).collect()}
    b = {r.media_id: r.feature for r in extract_features(_media(spark)).collect()}
    assert a == b
    assert a[0] != a[1]  # different payloads → different features


def test_stub_rejects_unknown_type():
    with pytest.raises(NotImplementedError):
        _decode_payload("hologram", b"xyz")


def test_sample_frames(spark):
    frames = sample_frames(_media(spark), every_ms=1000).collect()
    # video id=3, duration 3500ms → ts 0,1000,2000,3000
    assert [(r.media_id, r.frame_ts_ms) for r in frames] == [
        (3, 0),
        (3, 1000),
        (3, 2000),
        (3, 3000),
    ]


def test_resize_plan(spark):
    plans = {r.media_id: r for r in resize_plan(_media(spark), max_side=512).collect()}
    assert plans[0].target_width == 512 and plans[0].target_height == 384
    assert plans[1].scale == 1.0  # already small


def test_real_image_decode_when_codecs_present(spark):
    """Runs only where Pillow exists (auto-skips in this env): a real
    PNG must decode to a normalized histogram, not the hash stub."""
    import pytest

    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    import numpy as np
    from PIL import Image

    from real_time_data_anomaly_detection_spark.operators.multimodal import (
        FEATURE_DIM,
        _decode_payload,
    )

    buf = io.BytesIO()
    Image.new("L", (8, 8), color=128).save(buf, format="PNG")
    feat = _decode_payload("image", buf.getvalue())
    assert len(feat) == FEATURE_DIM
    assert abs(float(np.sum(feat)) - 1.0) < 1e-9  # histogram normalized
