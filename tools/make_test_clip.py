#!/usr/bin/env python
"""Generate a deterministic synthetic YUV 4:2:0 test clip.

The reference's canonical sequence (BlowingBubbles 416x240@50) is not
redistributable; tests and benches use this synthetic stand-in: moving
gradients + textured blobs + noise, which exercises intra prediction, motion,
and residual coding similarly. Deterministic (seeded) so golden hashes are
stable.
"""
import argparse
import numpy as np


def make_clip(width: int, height: int, frames: int, seed: int = 7) -> bytes:
    rng = np.random.default_rng(seed)
    # static texture layer (film grain-ish) + moving sinusoid gradients + a
    # couple of translating blobs => realistic mix of flat/textured/moving.
    tex = rng.integers(-12, 13, size=(height * 2, width * 2), dtype=np.int16)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    out = bytearray()
    for t in range(frames):
        base = (
            110
            + 60 * np.sin(2 * np.pi * (xx / 180.0 + 0.013 * t))
            + 40 * np.cos(2 * np.pi * (yy / 140.0 - 0.009 * t))
        )
        # translating texture (integer-pel motion of (2,1) per frame)
        ty, tx = (3 * t) % height, (5 * t) % width
        base = base + tex[ty : ty + height, tx : tx + width]
        # moving bright blob
        cx, cy = (40 + 6.5 * t) % width, (30 + 3.2 * t) % height
        r2 = (xx - cx) ** 2 + (yy - cy) ** 2
        base = base + 80 * np.exp(-r2 / (2 * 18.0**2))
        y = np.clip(base, 0, 255).astype(np.uint8)
        u = np.clip(
            128 + 30 * np.sin(2 * np.pi * (xx / 97.0 + 0.011 * t)), 0, 255
        ).astype(np.uint8)[::2, ::2]
        v = np.clip(
            128 + 30 * np.cos(2 * np.pi * (yy / 89.0 + 0.007 * t)), 0, 255
        ).astype(np.uint8)[::2, ::2]
        out += y.tobytes() + u.tobytes() + v.tobytes()
    return bytes(out)


def make_fade_clip(width: int, height: int, frames: int,
                   seed: int = 7) -> bytes:
    """Moving content under a global fade-to-bright (gain + offset ramp):
    the class of content weighted prediction exists for
    (WeightPredAnalysis.cpp — DC/AC tracking a per-frame illumination
    change)."""
    rng = np.random.default_rng(seed)
    tex = rng.integers(-10, 11, size=(height * 2, width * 2), dtype=np.int16)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    out = bytearray()
    for t in range(frames):
        base = (
            90
            + 45 * np.sin(2 * np.pi * (xx / 160.0 + 0.012 * t))
            + 30 * np.cos(2 * np.pi * (yy / 120.0 - 0.008 * t))
        )
        ty, tx = (2 * t) % height, (3 * t) % width
        base = base + tex[ty : ty + height, tx : tx + width]
        gain = 1.0 + 0.06 * t       # multiplicative fade (AC scales)
        off = 6.0 * t               # additive fade (DC shifts)
        y = np.clip(base * gain + off, 0, 255).astype(np.uint8)
        u = np.clip(
            (128 + 24 * np.sin(2 * np.pi * (xx / 90.0 + 0.01 * t)) - 128)
            * gain + 128 + 0.8 * t, 0, 255).astype(np.uint8)[::2, ::2]
        v = np.clip(
            (128 + 24 * np.cos(2 * np.pi * (yy / 85.0 + 0.006 * t)) - 128)
            * gain + 128 - 0.5 * t, 0, 255).astype(np.uint8)[::2, ::2]
        out += y.tobytes() + u.tobytes() + v.tobytes()
    return bytes(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--seed", type=int, default=7)
    a = ap.parse_args()
    with open(a.out, "wb") as f:
        f.write(make_clip(a.width, a.height, a.frames, a.seed))


if __name__ == "__main__":
    main()
