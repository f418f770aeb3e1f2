"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns + a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The decode kernels themselves need codec
libraries this environment does not ship, so they are STUBBED —
clearly marked — behind a deterministic fake used by tests; the
Spark-side contract (schema, batching, partition sizing) is real and
is what matters for the 100 TB design:

- media bytes never pass through Python row-at-a-time — Arrow batches
  only (mapInPandas);
- metadata lives in plain columns so filters (media_type, width,
  duration) prune BEFORE any decode work;
- decode output is a fixed-width feature vector, so downstream is
  ordinary relational/vector processing (similarity.py applies as-is).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def _decode_image_real(payload: bytes) -> np.ndarray | None:
    """Real image decode via Pillow, if importable (not in this env).

    Feature = FEATURE_DIM-bin grayscale intensity histogram, normalized
    — deterministic, resolution-independent, and the same fixed-width
    contract as the stub."""
    try:
        import io

        from PIL import Image  # optional dependency, absent here
    except ImportError:
        return None
    img = Image.open(io.BytesIO(payload)).convert("L")
    hist, _ = np.histogram(
        np.asarray(img, dtype=np.float64), bins=FEATURE_DIM, range=(0, 256)
    )
    total = hist.sum()
    return hist.astype(np.float64) / total if total else hist.astype(np.float64)


def _decode_audio_real(payload: bytes) -> np.ndarray | None:
    """Real audio decode via soundfile, if importable (not in this env).

    Feature = FEATURE_DIM-band mean absolute amplitude over equal time
    slices of the first channel."""
    try:
        import io

        import soundfile as sf  # optional dependency, absent here
    except ImportError:
        return None
    data, _rate = sf.read(io.BytesIO(payload), dtype="float64", always_2d=True)
    mono = np.abs(data[:, 0])
    if mono.size == 0:
        return np.zeros(FEATURE_DIM)
    bands = np.array_split(mono, FEATURE_DIM)
    return np.array([b.mean() if b.size else 0.0 for b in bands])


def _decode_payload(media_type: str, payload: bytes) -> np.ndarray:
    """Decode kernel: real codecs when importable, stub otherwise.

    Pillow (image) / soundfile (audio) are attempted at call time —
    neither ships in this environment, so the deterministic fallback
    derives FEATURE_DIM doubles from the payload's sha256; tests assert
    the end-to-end plumbing (schema, batching, determinism) either way,
    and the real-decode test auto-skips without codecs. Video would
    need libav/ffmpeg and always falls back here.
    """
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"unsupported media_type {media_type!r}")
    if payload:
        try:
            real = (
                _decode_image_real(bytes(payload))
                if media_type == "image"
                else _decode_audio_real(bytes(payload))
                if media_type == "audio"
                else None
            )
        except Exception:  # undecodable bytes → deterministic fallback
            real = None
        if real is not None:
            return real
    digest = hashlib.sha256(payload or b"").digest()
    # 16 doubles in [0, 1) from the 32-byte digest.
    raw = np.frombuffer(digest, dtype=np.uint16).astype(np.float64)
    return raw / 65536.0


def extract_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """media rows → FEATURE_DIM-dim feature vectors via mapInPandas.

    Arrow-batched: each pandas chunk holds many payloads; the loop is
    per-row only inside the already-batched Python worker. Null
    payloads yield null features (kept, so joins don't silently drop)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None
                if payload is None
                else _decode_payload(mt, bytes(payload)).tolist()
                for mt, payload in zip(pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                }
            )

    return df.mapInPandas(_extract, _FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: explode per-frame timestamps
    from metadata — pure column math, no decode. Pairs each (media_id,
    frame_ts_ms); the downstream decode of individual frames would use
    extract_features on per-frame payloads."""
    return (
        df.filter(F.col("media_type") == "video")
        .filter(F.col("meta.duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def resize_plan(df: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize bookkeeping: compute target dims from metadata columns so
    the (stubbed) pixel work is pre-filtered to rows that need it."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(
        F.greatest(w, h) > max_side, F.greatest(w, h) / F.lit(float(max_side))
    ).otherwise(F.lit(1.0))
    return df.filter(F.col("media_type") == "image").select(
        "media_id",
        w.alias("width"),
        h.alias("height"),
        F.round(scale, 4).alias("scale"),
        (w / scale).cast("int").alias("target_width"),
        (h / scale).cast("int").alias("target_height"),
    )
