"""Per-codec decode microbench (VERDICT r4 item 3): makes the
pure-Python codec cost a NUMBER instead of an adjective.

No Spark — this times the per-payload decode callables exactly as they
run inside the mapInPandas slot (the plan around them is zero-exchange;
the codec IS the cost). For each codec: encode a deterministic fixture
set once (not timed), then decode the whole set `--runs` times and
report the best run as payload MB/s and payloads/sec.

Usage: python tools/codec_bench.py [--runs 3] [--n 200]
Prints one JSON line per codec + a markdown table for BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from beholder_spark.operators import multimodal as mm  # noqa: E402
from beholder_spark.operators import parse as po  # noqa: E402


def _fixtures(n: int) -> dict[str, tuple]:
    """codec -> (payload list, decode callable[, billed bytes]). Dimensions
    mirror the oracle queries' derivations so the timed work is the same
    shape the driver sweep decodes."""
    wav = [mm.make_wav_bytes(i % 2000 + 100) for i in range(n)]
    bmp = [mm.make_bmp_bytes(i % 64 + 8, i % 32 + 8, i % 256) for i in range(n)]
    png = [mm.make_png_bytes(i % 64 + 8, i % 32 + 8, i % 256) for i in range(n)]
    jpg = [
        mm.make_jpeg_bytes(8 * (i % 6 + 1), 8 * (i % 4 + 1), i % 256, i % 97 + 1)
        for i in range(n)
    ]
    jpr = [
        mm.make_jpeg_progressive_bytes(8 * (i % 6 + 1), 8 * (i % 4 + 1), i % 256, i % 97 + 1)
        for i in range(n)
    ]
    gif = [mm.make_gif_bytes(i % 17 + 4, i % 9 + 2, i % 256, interlace=i % 5 == 0) for i in range(n)]
    mp3 = [mm.make_mp3_bytes(i % 30 + 5, 64 + (i % 4) * 32) for i in range(n)]
    avi = [
        mm.make_avi_bytes([mm.make_jpeg_bytes(16, 16, (i + j) % 256, 1) for j in range(4)], 16, 16)
        for i in range(n // 4 + 1)
    ]
    warc = [po.make_warc_bytes(i, f"doc {i} body text " * (i % 20 + 1), "en") for i in range(n)]
    return {
        "wav_pcm": (wav, mm.decode_wav_bytes),
        "bmp24": (bmp, mm.decode_bmp_bytes),
        "png": (png, mm.decode_png_bytes),
        "jpeg_baseline": (jpg, mm.decode_jpeg_bytes),
        "jpeg_progressive": (jpr, mm.decode_jpeg_bytes),
        "gif_lzw": (gif, mm.decode_gif_bytes),
        "mp3_meta_walk": (mp3, mm.parse_mp3_meta_bytes),
        # same work as sample_video_frames' inner loop at every_n=2.
        # MB/s must bill only the DECODED bytes (the sampled frames'
        # JPEG chunks), not the whole container — billing container
        # bytes against half-the-frames decode time inflated this row
        # ~2x in the first published table.
        "avi_mjpeg_frames": (
            avi,
            lambda b: [mm.decode_image_bytes(f) for f in mm._avi_video_chunks(b)[::2]],
            sum(len(f) for b in avi for f in mm._avi_video_chunks(b)[::2]),
        ),
        "warc_records": (warc, lambda b: po._warc_segment_rows(0, b)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--n", type=int, default=200)
    args = ap.parse_args()

    rows = []
    for name, spec in _fixtures(args.n).items():
        payloads, fn = spec[0], spec[1]
        # optional third element: billed byte count (when the callable
        # decodes only part of each payload, e.g. sampled video frames)
        total_bytes = spec[2] if len(spec) > 2 else sum(len(p) for p in payloads)
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.monotonic()
            for p in payloads:
                fn(p)
            best = min(best, time.monotonic() - t0)
        rec = {
            "codec": name,
            "payloads": len(payloads),
            "bytes": total_bytes,
            "best_sec": round(best, 4),
            "mb_per_sec": round(total_bytes / best / 1e6, 3),
            "payloads_per_sec": round(len(payloads) / best, 1),
        }
        rows.append(rec)
        print(json.dumps(rec))

    print("\n| codec | payloads | MB | best sec | MB/s | payloads/s |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['codec']} | {r['payloads']} | {r['bytes'] / 1e6:.2f} "
            f"| {r['best_sec']} | {r['mb_per_sec']} | {r['payloads_per_sec']} |"
        )


if __name__ == "__main__":
    main()
