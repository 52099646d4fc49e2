#!/usr/bin/env python
"""Annex-B byte counting: per-NAL-type byte/count statistics.

Counterpart of the reference's App/utils/annexBbytecount (SURVEY.md §2.3
"Utils"). Prints one line per NAL plus a per-type summary.

Usage: python tools/annexb_bytecount.py stream.bin [-q]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAL_NAMES = {
    0: "TRAIL_N", 1: "TRAIL_R", 19: "IDR_W_RADL", 20: "IDR_N_LP",
    21: "CRA", 32: "VPS", 33: "SPS", 34: "PPS", 35: "AUD",
    39: "PREFIX_SEI", 40: "SUFFIX_SEI",
}


def main():
    from tpuhevc.entropy import bitio

    ap = argparse.ArgumentParser()
    ap.add_argument("stream")
    ap.add_argument("-q", "--quiet", action="store_true",
                    help="summary only")
    a = ap.parse_args()
    data = open(a.stream, "rb").read()
    nals = bitio.read_annexb(data)
    per_type: dict = {}
    total = 0
    for i, nal in enumerate(nals):
        t = (nal[0] >> 1) & 0x3F
        name = NAL_NAMES.get(t, f"type{t}")
        n = len(nal) + 4  # start code accounted like the reference tool
        total += n
        cnt, byts = per_type.get(name, (0, 0))
        per_type[name] = (cnt + 1, byts + n)
        if not a.quiet:
            print(f"NAL {i:5d}  {name:12s} {n:8d} bytes")
    print(f"\n{'type':12s} {'count':>7s} {'bytes':>10s} {'share':>7s}")
    for name, (cnt, byts) in sorted(per_type.items(),
                                    key=lambda kv: -kv[1][1]):
        print(f"{name:12s} {cnt:7d} {byts:10d} {byts / total:6.1%}")
    print(f"{'total':12s} {sum(c for c, _ in per_type.values()):7d} "
          f"{total:10d}")


if __name__ == "__main__":
    main()
