#!/usr/bin/env python
"""Natural-statistics test clip for RD measurement (CTC-class stand-in).

The machine has no network egress and no raw CTC sequences on disk, so
this synthesizes content with the statistics that make video coding hard
in the same ways natural video is hard (the scoreboard's previous
12-frame 192x128 synthetic was flagged as too easy):

- 1/f^alpha spatial spectrum background (FFT synthesis) — natural-image
  second-order statistics, detail at every scale;
- slow camera pan with SUBPIXEL bilinear resampling (exercises FME);
- several textured elliptical foreground objects with independent
  motions, soft borders, and occlusion;
- a low-amplitude temporal grain field (film-grain-like, defeats
  pure-skip coding) plus a mild global luminance drift (WP-relevant);
- chroma planes derived from independently colored regions so chroma
  carries real structure.

Deterministic (seeded). Output: planar YUV420 8-bit.
Usage: python tools/make_natural_clip.py out.yuv [W H N [seed]]
"""

from __future__ import annotations

import sys

import numpy as np


def fractal(h, w, rng, alpha=1.6):
    """1/f^alpha random field in [0, 1]."""
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    f = np.sqrt(fy * fy + fx * fx)
    f[0, 0] = 1.0
    spec = (rng.standard_normal((h, f.shape[1]))
            + 1j * rng.standard_normal((h, f.shape[1]))) / f ** alpha
    spec[0, 0] = 0
    img = np.fft.irfft2(spec, s=(h, w))
    img -= img.min()
    m = img.max()
    return img / m if m > 0 else img


def bilinear(img, ys, xs):
    h, w = img.shape
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 2)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 2)
    fy = np.clip(ys - y0, 0, 1)
    fx = np.clip(xs - x0, 0, 1)
    a = img[y0, x0] * (1 - fy) * (1 - fx)
    b = img[y0, x0 + 1] * (1 - fy) * fx
    c = img[y0 + 1, x0] * fy * (1 - fx)
    d = img[y0 + 1, x0 + 1] * fy * fx
    return a + b + c + d


def make_natural_clip(w, h, n, seed=7):
    rng = np.random.default_rng(seed)
    mh, mw = h + 128, w + 128  # panning canvas
    bg = 40 + 170 * fractal(mh, mw, rng, 1.7)
    bg_u = 96 + 64 * fractal(mh // 2, mw // 2, rng, 2.0)
    bg_v = 128 + 56 * fractal(mh // 2, mw // 2, rng, 2.0)

    n_obj = 5
    objs = []
    for k in range(n_obj):
        os_ = int(rng.integers(28, 64))
        objs.append(dict(
            tex=30 + 190 * fractal(os_, os_, rng, 1.3),
            u=float(rng.uniform(60, 180)), v=float(rng.uniform(80, 200)),
            x=float(rng.uniform(0, w - os_)), y=float(rng.uniform(0, h - os_)),
            dx=float(rng.uniform(-3.5, 3.5)), dy=float(rng.uniform(-2.5, 2.5)),
            s=os_,
        ))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    cyy, cxx = np.mgrid[0:h // 2, 0:w // 2].astype(np.float64)
    frames = []
    for t in range(n):
        # camera pan: non-integer velocity -> subpel phases cycle
        px = 20 + 1.6 * t
        py = 30 + 0.9 * t
        y = bilinear(bg, yy + py, xx + px)
        u = bilinear(bg_u, cyy + py / 2, cxx + px / 2)
        v = bilinear(bg_v, cyy + py / 2, cxx + px / 2)
        for k, o in enumerate(objs):
            s = o["s"]
            ox = o["x"] + o["dx"] * t
            oy_ = o["y"] + o["dy"] * t
            ox = ox % (w + s) - s / 2  # wrap around the frame
            oy_ = oy_ % (h + s) - s / 2
            oys = yy - oy_
            oxs = xx - ox
            r2 = ((oys / (s / 2) - 1) ** 2 + (oxs / (s / 2) - 1) ** 2)
            mask = np.clip(1.8 - 2.0 * r2, 0, 1)  # soft elliptical edge
            tex = bilinear(o["tex"], np.clip(oys, 0, s - 1),
                           np.clip(oxs, 0, s - 1))
            y = y * (1 - mask) + tex * mask
            cm = mask[::2, ::2]
            u = u * (1 - cm) + o["u"] * cm
            v = v * (1 - cm) + o["v"] * cm
        # film grain + slow luminance drift
        y = y + rng.normal(0, 1.5, y.shape) + 2.0 * np.sin(t / 9.0)
        frames.append((
            np.clip(y, 0, 255).astype(np.uint8),
            np.clip(u, 0, 255).astype(np.uint8),
            np.clip(v, 0, 255).astype(np.uint8),
        ))
    return frames


def main():
    out = sys.argv[1]
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 416
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 240
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    seed = int(sys.argv[5]) if len(sys.argv) > 5 else 7
    with open(out, "wb") as f:
        for y, u, v in make_natural_clip(w, h, n, seed):
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())
    print(f"wrote {out}: {w}x{h} x{n} yuv420p8")


if __name__ == "__main__":
    main()
