#!/usr/bin/env python
"""NN-FME dataset extraction: the in-encoder data-collection pass.

Counterpart of the reference's extraction hooks (xTZSearchHelp save flag +
the CSV dump at TEncSearch.cpp:4561-4582, driven by DL/Extract_data.sh):
for every 16x16 block of every P frame, record the 3x3 integer-pel SAD
surface [TL,T,TR,L,C,R,BL,B,BR], the PU dims, and the label class produced
by the standard DCT-IF fractional search (the NN's training target,
class = (qy+3)*7 + (qx+3)).

Output CSV columns: TL,T,TR,L,C,R,BL,B,BR,Width,Height,label

Usage:
  python tools/extract_fme_dataset.py out.csv --input clip.yuv \
      --width 416 --height 240 --frames 32 --qp 32
(with no --input, the deterministic synthetic test clip is used)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def extract(frames, qp: int, sr: int = 16):
    """frames: list of (y, u, v) uint8. Returns (sads9 (N,9), dims (N,2),
    labels (N,)). Reference-recon loop: integer ME + DCT-IF label per
    block against the previous frame's reconstruction-equivalent (here:
    the previous original, as DL/Extract_data.sh runs at the default
    encoder settings and labels only depend on the search)."""
    from tpuhevc.ops.me import fracdif_refine_np, integer_me_np, sad_surface_np
    from tpuhevc.utils.tables import qp_to_lambda

    lam = int(round(np.sqrt(qp_to_lambda(qp, 0.4624)) * 256))
    rows_s, rows_d, rows_l = [], [], []
    for i in range(1, len(frames)):
        cur_y = frames[i][0].astype(np.int32)
        ref_y = frames[i - 1][0].astype(np.int32)
        h, w = cur_y.shape
        xs, ys = [], []
        for y0 in range(0, h - 15, 16):
            for x0 in range(0, w - 15, 16):
                xs.append(x0)
                ys.append(y0)
        xs = np.array(xs)
        ys = np.array(ys)
        cur = np.stack([cur_y[y : y + 16, x : x + 16]
                        for x, y in zip(xs, ys)])
        mv_int, sad_map, best = integer_me_np(ref_y, cur, xs, ys, sr, lam)
        sad9 = sad_surface_np(sad_map, best)
        mvq = fracdif_refine_np(ref_y, cur, xs, ys, mv_int, lam)
        off = mvq - mv_int * 4
        off = np.clip(off, -3, 3)
        label = (off[:, 1] + 3) * 7 + (off[:, 0] + 3)
        rows_s.append(sad9)
        rows_d.append(np.full((len(xs), 2), 16))
        rows_l.append(label)
    return (np.concatenate(rows_s), np.concatenate(rows_d),
            np.concatenate(rows_l))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--input")
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--qp", type=int, default=32)
    a = ap.parse_args()
    w, h = a.width, a.height
    fsz = w * h * 3 // 2
    if a.input:
        raw = open(a.input, "rb").read()[: a.frames * fsz]
    else:
        from tools.make_test_clip import make_clip

        raw = make_clip(w, h, a.frames)
    frames = []
    for i in range(len(raw) // fsz):
        b = np.frombuffer(raw[i * fsz : (i + 1) * fsz], np.uint8)
        frames.append((b[: w * h].reshape(h, w),
                       b[w * h : w * h * 5 // 4].reshape(h // 2, w // 2),
                       b[w * h * 5 // 4 :].reshape(h // 2, w // 2)))
    sads, dims, labels = extract(frames, a.qp)
    with open(a.out, "w") as f:
        f.write("TL,T,TR,L,C,R,BL,B,BR,Width,Height,label\n")
        for s, d, l in zip(sads, dims, labels):
            f.write(",".join(str(int(x)) for x in s)
                    + f",{d[0]},{d[1]},{l}\n")
    print(f"{a.out}: {len(labels)} samples, "
          f"{len(np.unique(labels))} distinct classes")


if __name__ == "__main__":
    main()
