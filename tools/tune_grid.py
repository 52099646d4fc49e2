#!/usr/bin/env python
"""A/B two _TUNE configurations of the grid path on identical input and
compare the packed output buffers (and hence the bitstream) byte-exactly.

The fused candidate sweep (cand_sweep_all) is the same math as the
per-class cand_sweep, so its packed frame buffers must match bit-for-bit;
this harness proves it on this machine before the default flips.

Usage:
  python tools/tune_grid.py --knob fuse_sweep [--frames 8]
      [--width 192 --height 128] [--qp 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(cfg, clip, frames):
    import jax.numpy as jnp

    from tpuhevc.codec import inter_grid
    from tpuhevc.codec.encoder import Encoder

    enc = Encoder(cfg)
    G = len(cfg.gop_qp_offsets or (0,))
    n_gops = (frames - 1) // G or 1
    fn, meta, qps = inter_grid.build_ldp_grid_scan(
        cfg, {cfg.qp: enc.nn_params}, n_gops)
    enc.encode_frame(*clip[0], poc=0)
    R = max(1, cfg.num_ref_frames)
    ry = jnp.repeat(jnp.asarray(
        np.asarray(enc.dpb_recon[0], np.int32))[None], R, 0)
    ruv = jnp.repeat(jnp.concatenate(
        [jnp.asarray(np.asarray(p, np.int32))
         for p in enc.dpb_recon[1:]], axis=1)[None], R, 0)
    n = n_gops * G
    rows = [np.concatenate([f[0].ravel(), f[1].ravel(), f[2].ravel()])
            for f in clip[1 : n + 1]]
    while len(rows) < n:
        rows.append(rows[-1])
    nav = jnp.ones((n_gops, G), jnp.int32)
    t0 = time.time()
    buf, _, _ = fn(jnp.asarray(
        np.stack(rows).reshape(n_gops, G, -1)), nav, ry, ruv)
    buf = np.asarray(buf)
    return buf, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--knob", default="fuse_sweep")
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--qp", type=int, default=32)
    a = ap.parse_args()

    from tools.make_test_clip import make_clip
    from tpuhevc.codec import inter_grid
    from tpuhevc.config.options import build_config, parse_cfg_file

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    opts = parse_cfg_file(os.path.join(repo, "cfg",
                                       "encoder_lowdelay_P_main.cfg"))
    opts.update(SourceWidth=str(a.width), SourceHeight=str(a.height),
                QP=str(a.qp))
    cfg, _ = build_config(opts)
    cfg.inter_backend = "jax"

    w, h = a.width, a.height
    raw = make_clip(w, h, a.frames + 1)
    fsz = w * h * 3 // 2
    clip = []
    for i in range(a.frames + 1):
        b = np.frombuffer(raw[i * fsz : (i + 1) * fsz], dtype=np.uint8)
        clip.append((b[: w * h].reshape(h, w),
                     b[w * h : w * h * 5 // 4].reshape(h // 2, w // 2),
                     b[w * h * 5 // 4 :].reshape(h // 2, w // 2)))

    results = {}
    for val in (False, True):
        old = inter_grid._TUNE.get(a.knob)
        inter_grid._TUNE[a.knob] = val
        try:
            buf, dt = run_once(cfg, clip, a.frames)
        finally:
            inter_grid._TUNE[a.knob] = old
        results[val] = buf
        print(f"{a.knob}={val}: {buf.shape} in {dt:.2f}s", flush=True)

    same = np.array_equal(results[False], results[True])
    if same:
        print(f"EQUAL: {a.knob} on/off produce identical packed buffers")
        return 0
    d = results[False] != results[True]
    frames_diff = [int(j) for j in range(d.shape[0]) if d[j].any()]
    print(f"DIFFER on frames {frames_diff} "
          f"({int(d.sum())} of {d.size} bytes)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
