"""Media decode-throughput ladder (round-13, VERDICT r12 #4).

The video family's 100 TB cost is DECODE, not shuffle — every
q_video_* plan ships only 8-byte hashes after the Arrow worker, so
capacity planning reduces to "how many JPEG bytes does one core chew
per second, and what does the Spark/Arrow envelope add on top". This
ladder measures exactly that, so SCALING §7.3's perceptual-dedup
sizing is a lookup, not a guess:

1. BARE-LOOP tier — ``_jpeg_gray_pixels`` (full marker parse,
   canonical Huffman, DPCM, dequant, IDCT — the production entropy
   decoder) over N in-memory frames on ONE core, at two frame
   geometries: 72×56 (the oracle fixture size) and 720×560 (a
   realistic thumbnail-extract size, 100× the pixels). Published as
   frames/s/core and MB/s/core of compressed input.
2. SPARK-PATH tier — ``video_frame_dhash`` over a mixed AVI/MOV
   corpus (the _synth_doc_videos fixture: real containers, 2-4 frames
   each) on local[N]. Published as aggregate frames/s, plus the
   PER-FRAME core-cost split: (cores × wall / frames) vs the bare
   per-frame cost — the difference is the Python/Arrow envelope
   (serialization, container walk, scheduling), measured not guessed.

Interleaved min-of-3 after a warm pass (the stress.py stall-dodging
discipline); run SOLO like every timing tool.

Usage: python tools/decode_ladder.py [n_frames_bare] [n_videos_spark]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")


def _frames(n: int, blocks_w: int, blocks_h: int) -> list[bytes]:
    """n distinct DC-only baseline JPEGs at the given block geometry —
    md5-derived DC values so content (and Huffman symbol mix) varies
    per frame like the oracle fixture's."""
    from real_time_data_anomaly_detection_spark.operators.multimodal import (
        _dc_only_jpeg,
    )

    nb = blocks_w * blocks_h
    out = []
    for i in range(n):
        hx = ""
        j = 0
        while len(hx) < nb:
            hx += hashlib.md5(f"ladder:{i}:{j}".encode()).hexdigest()
            j += 1
        out.append(
            _dc_only_jpeg(
                [int(c, 16) * 8 - 64 for c in hx[:nb]], blocks_w, blocks_h
            )
        )
    return out


def _bare_tier(name: str, frames: list[bytes], rounds: int = 3):
    from real_time_data_anomaly_detection_spark.operators.multimodal import (
        _jpeg_gray_pixels,
    )

    nbytes = sum(len(f) for f in frames)
    for f in frames[:4]:  # warm (imports, first-call setup)
        _jpeg_gray_pixels(f)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        for f in frames:
            _jpeg_gray_pixels(f)
        best = min(best, time.time() - t0)
    fps = len(frames) / best
    mbs = nbytes / best / 1e6
    return name, len(frames), nbytes, fps, mbs, best / len(frames)


def main() -> None:
    n_bare = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    n_vids = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    # ---- bare-loop tiers (no Spark yet: clean single-core numbers)
    tiers = [
        _bare_tier("72x56 (9x7 blocks)", _frames(n_bare, 9, 7)),
        _bare_tier("720x560 (90x70)", _frames(max(n_bare // 20, 8), 90, 70)),
    ]
    print(f"{'bare-loop tier':>20} {'frames':>7} {'bytes':>9} "
          f"{'frames/s/core':>14} {'MB/s/core':>10} {'s/frame':>9}")
    per_frame_bare = None
    for name, nf, nb, fps, mbs, spf in tiers:
        print(f"{name:>20} {nf:>7} {nb:>9} {fps:>14.1f} {mbs:>10.2f} "
              f"{spf:>9.5f}")
        if per_frame_bare is None:
            per_frame_bare = spf  # 72x56: the Spark corpus's geometry

    # ---- Spark path over the mixed AVI/MOV corpus
    from real_time_data_anomaly_detection_spark.operators.multimodal import (
        _synth_doc_videos,
        video_frame_dhash,
    )
    from real_time_data_anomaly_detection_spark.session import get_spark

    spark = get_spark(app_name="decode_ladder", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    vids = _synth_doc_videos(
        spark.range(n_vids).selectExpr("id AS doc_id")
    ).localCheckpoint()  # synthesis OUT of the timed region
    n_frames = None
    best = float("inf")
    for i in range(4):  # pass 0 warms
        t0 = time.time()
        n_frames = (
            video_frame_dhash(vids, "payload", "doc_id", hash_w=8, hash_h=7)
            .count()
        )
        dt = time.time() - t0
        if i:
            best = min(best, dt)
    agg_fps = n_frames / best
    core_s_per_frame = best * cores / n_frames
    envelope = core_s_per_frame - per_frame_bare
    print(f"\n{'spark path':>20} {'videos':>7} {'frames':>7} "
          f"{'wall s':>7} {'frames/s agg':>13} {'core-s/frame':>13} "
          f"{'envelope':>9}")
    print(f"{f'mixed AVI/MOV x{cores}':>20} {n_vids:>7} {n_frames:>7} "
          f"{best:>7.2f} {agg_fps:>13.1f} {core_s_per_frame:>13.5f} "
          f"{envelope:>9.5f}")
    print(
        f"\nenvelope = Spark core-seconds per frame minus bare decode "
        f"({per_frame_bare:.5f}s): container walk + Arrow transfer + "
        f"scheduling = {100 * envelope / core_s_per_frame:.0f}% of the "
        f"Spark-path core cost at this frame size"
    )


if __name__ == "__main__":
    main()
