"""Per-stream coding-tool statistics: CU sizes, partitions, intra-in-P,
TU splits, skip/merge rates — tabulated from a decoded bitstream.

The decoder's FrameSyntax captures every mode decision; diffing the
distribution between an HM anchor stream and ours shows which tools the
anchor leans on that our encoder never produces (the VERDICT's partition
/ intra-in-P gap, TEncCu.cpp:451-628). Usage:

  python tools/stream_stats.py stream.bin [stream2.bin ...]
"""

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def stats(path):
    import tpuhevc.codec.decoder as D
    from tpuhevc.codec.decoder import decode_stream

    fss = []
    types = []
    orig = D.decode_slice_data

    def cap(dec, sps, pps, w, h, st, mm, **kw):
        fs = orig(dec, sps, pps, w, h, st, mm, **kw)
        fss.append(fs)
        types.append(st)
        return fs

    D.decode_slice_data = cap
    try:
        frames = decode_stream(open(path, "rb").read())
    finally:
        D.decode_slice_data = orig
    ok = sum(1 for f in frames if f.md5_ok)
    print(f"== {path}: {len(frames)} frames, {ok} hash-OK")
    cu = Counter()
    part = Counter()
    mode = Counter()
    tusplit = Counter()
    n_inter_frames = 0
    for fs, st in zip(fss, types):
        if st == 2:
            continue
        n_inter_frames += 1
        seen = np.zeros(fs.cu_log2.shape, bool)
        h8, w8 = fs.cu_log2.shape
        for y8 in range(h8):
            for x8 in range(w8):
                if seen[y8, x8]:
                    continue
                lg = int(fs.cu_log2[y8, x8])
                s8 = 1 << (lg - 3)
                seen[y8 : y8 + s8, x8 : x8 + s8] = True
                cu[1 << lg] += 1
                intra = int(fs.inter_dir[y8, x8]) == 0
                if intra:
                    mode["intra"] += 1
                elif fs.skip[y8, x8]:
                    mode["skip"] += 1
                elif fs.merge_flag[y8, x8]:
                    mode["merge"] += 1
                else:
                    mode["amvp"] += 1
                if not intra:
                    # partition: how many distinct (mv,ref,dir) subrects
                    y4, x4 = y8 * 2, x8 * 2
                    s4 = s8 * 2
                    sub = np.concatenate(
                        [fs.mv4[y4 : y4 + s4, x4 : x4 + s4].reshape(-1, 2),
                         fs.mv4_l1[y4 : y4 + s4,
                                   x4 : x4 + s4].reshape(-1, 2),
                         fs.ref4[y4 : y4 + s4,
                                 x4 : x4 + s4].reshape(-1, 1),
                         fs.dir4[y4 : y4 + s4,
                                 x4 : x4 + s4].reshape(-1, 1)], 1)
                    uniq = len(np.unique(sub, axis=0))
                    part["1pu" if uniq <= 1 else "multi"] += 1
                    tu = fs.tu_log2[y4 : y4 + s4, x4 : x4 + s4]
                    tusplit["split" if (tu < min(lg, 5)).any()
                            else "tu=cu"] += 1
    tot = sum(cu.values()) or 1
    print(f"  inter frames: {n_inter_frames}")
    print("  CU sizes:   ", {k: f"{v * 100 // tot}%"
                             for k, v in sorted(cu.items())})
    print("  modes:      ", {k: f"{v * 100 // tot}%"
                             for k, v in mode.items()})
    print("  inter PUs:  ", {k: f"{v * 100 // max(1, sum(part.values()))}%"
                             for k, v in part.items()})
    print("  TU:         ", {k: f"{v * 100 // max(1, sum(tusplit.values()))}%"
                             for k, v in tusplit.items()})


if __name__ == "__main__":
    for p in sys.argv[1:]:
        stats(p)
