#!/usr/bin/env python
"""Bitrate targeting: search the QP that hits a target bitrate.

Counterpart of the reference's App/utils/BitrateTargeting
(GuessLambdaModifiers.cpp:484 — SURVEY.md §2.3): the reference bisects
lambda modifiers across meta runs of the encoder; this tool bisects the
base QP (the modern equivalent given the in-loop R-lambda rate control in
codec/ratectrl.py handles fine-grained targeting) and reports the
achieved rate per probe.

Usage:
  python tools/guess_lambda_modifiers.py --input in.yuv --width 416 \
      --height 240 --frames 16 --target-kbps 800
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_probe(frames, qp, frame_rate):
    from tpuhevc.codec.encoder import encode_sequence
    from tpuhevc.codec.params import EncoderConfig, SeqParams

    h, w = frames[0][0].shape
    cfg = EncoderConfig(sps=SeqParams(width=w, height=h,
                                      max_tu_depth_intra=0),
                        qp=qp, intra_period=-1, fme_mode="none",
                        inter_backend="np", frame_rate=frame_rate)
    enc, _ = encode_sequence(_Reader(frames), cfg, max_frames=len(frames))
    bits = sum(r.bits for r in enc.results)
    return bits * frame_rate / len(frames) / 1000.0


class _Reader:
    def __init__(self, frames):
        self.frames = frames

    def read_frame(self, i):
        return self.frames[i] if i < len(self.frames) else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input")
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--frame-rate", type=int, default=50)
    ap.add_argument("--target-kbps", type=float, required=True)
    ap.add_argument("--iterations", type=int, default=6)
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
    lo, hi = 10, 48
    best = None
    for it in range(a.iterations):
        qp = (lo + hi) // 2
        kbps = run_probe(frames, qp, a.frame_rate)
        print(f"iter {it}: QP {qp} -> {kbps:.1f} kbps "
              f"(target {a.target_kbps})")
        if best is None or abs(kbps - a.target_kbps) < abs(best[1]
                                                           - a.target_kbps):
            best = (qp, kbps)
        if kbps > a.target_kbps:
            lo = qp + 1
        else:
            hi = qp - 1
        if lo > hi:
            break
    print(f"best: QP {best[0]} at {best[1]:.1f} kbps")


if __name__ == "__main__":
    main()
