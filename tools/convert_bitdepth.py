#!/usr/bin/env python
"""Planar YUV bit-depth conversion (N-bit -> M-bit, 4:2:0).

Counterpart of the reference's App/utils/convert_NtoMbit_YCbCr
(SURVEY.md §2.3 "Utils"): scaling by shift with rounding on downshift,
matching TVideoIOYuv's MSB-aligned conversion.

Usage: python tools/convert_bitdepth.py in.yuv out.yuv \
    --width 416 --height 240 --from-bits 8 --to-bits 10
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert(frame: np.ndarray, nbits: int, mbits: int) -> np.ndarray:
    if mbits >= nbits:
        return (frame.astype(np.uint16) << (mbits - nbits))
    sh = nbits - mbits
    return ((frame.astype(np.int32) + (1 << (sh - 1))) >> sh).clip(
        0, (1 << mbits) - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inp")
    ap.add_argument("out")
    ap.add_argument("--width", type=int, required=True)
    ap.add_argument("--height", type=int, required=True)
    ap.add_argument("--from-bits", type=int, default=8)
    ap.add_argument("--to-bits", type=int, default=10)
    a = ap.parse_args()
    n_dt = np.uint8 if a.from_bits <= 8 else np.dtype("<u2")
    m_dt = np.uint8 if a.to_bits <= 8 else np.dtype("<u2")
    fpx = a.width * a.height * 3 // 2
    raw = np.fromfile(a.inp, dtype=n_dt)
    nframes = len(raw) // fpx
    with open(a.out, "wb") as f:
        for i in range(nframes):
            fr = raw[i * fpx : (i + 1) * fpx]
            f.write(np.ascontiguousarray(
                convert(fr, a.from_bits, a.to_bits), dtype=m_dt).tobytes())
    print(f"{nframes} frames converted {a.from_bits} -> {a.to_bits} bit")


if __name__ == "__main__":
    main()
