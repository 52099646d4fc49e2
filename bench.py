#!/usr/bin/env python
"""Benchmark: encoded 416x240 all-intra frames/s on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver north-star of 50 encoded 416x240 LD-P frames/s/chip
(BASELINE.md); until the inter path lands this measures the all-intra
pipeline (JAX wavefront device pass + host CABAC serialization), which is
strictly more work per frame than LD-P's P-frames at matched size.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np

    from tools.make_test_clip import make_clip
    from tpuhevc.codec.encoder import Encoder
    from tpuhevc.codec.intra_jax import encode_frame_intra_jax
    from tpuhevc.codec.params import EncoderConfig, SeqParams

    w, h, frames = 416, 240, 16
    raw = make_clip(w, h, frames)
    fsz = w * h * 3 // 2
    clip = []
    for i in range(frames):
        buf = np.frombuffer(raw[i * fsz : (i + 1) * fsz], dtype=np.uint8)
        y = buf[: w * h].reshape(h, w)
        u = buf[w * h : w * h + w * h // 4].reshape(h // 2, w // 2)
        v = buf[w * h + w * h // 4 :].reshape(h // 2, w // 2)
        clip.append((y, u, v))

    cfg = EncoderConfig(
        sps=SeqParams(width=w, height=h, max_tu_depth_intra=0), qp=32
    )

    class _Reader:
        def read_frame(self, i):
            return clip[i] if i < len(clip) else None

    from tpuhevc.codec.encoder import encode_sequence

    fps = None
    for batch in (8, 4, 1, 0):
        try:
            encode_sequence(_Reader(), cfg, max_frames=min(8, frames),
                            device_batch=batch)  # warmup incl. jit compile
            t0 = time.time()
            encode_sequence(_Reader(), cfg, max_frames=frames,
                            device_batch=batch)
            fps = frames / (time.time() - t0)
            break
        except Exception as e:  # tunnel/device hiccup: degrade gracefully
            print(f"# batch={batch} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    assert fps is not None

    print(json.dumps({
        "metric": "encoded 416x240 all-intra frames/s/chip",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 50.0, 4),
    }))


if __name__ == "__main__":
    main()
