#!/usr/bin/env python
"""Decoder-side bit + decision profile of ANY HEVC stream (ours or HM's).

The encoder-side counterpart (tools/bitprofile.py) can only profile our
own encodes; this one decodes an Annex-B file through our general
decoder, accounting fractional CABAC bits per syntax category (the same
estimation the reference's RExt__DECODER_DEBUG_BIT_STATISTICS build
performs, TComCodingStatistics.h / SURVEY.md §4.4) and reporting the
DECISION statistics (CU-size / skip / merge / TU-split / partition
histograms, coefficient counts). Run it on an HM anchor stream and on
ours at the same QP to attribute an equal-QP bit gap to a syntax class
and to the decisions behind it.

Usage:
  python tools/stream_profile.py stream.bin [more.bin ...]
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def install(stats, decisions):
    from tpuhevc.entropy import cabac, residual, syntax
    from tpuhevc.entropy.cabac import _EBITS

    state = dict(cat="other", frame=0)

    orig_bin = cabac.CabacDecoder.decode_bin
    orig_ep = cabac.CabacDecoder.decode_bin_ep
    orig_eps = cabac.CabacDecoder.decode_bins_ep
    orig_trm = cabac.CabacDecoder.decode_bin_trm

    def decode_bin(self, ctx_idx):
        s = self.ctx.states[ctx_idx]
        v = orig_bin(self, ctx_idx)
        stats[state["cat"]] += _EBITS[s ^ v] / 32768.0
        return v

    def decode_bin_ep(self):
        stats[state["cat"]] += 1.0
        return orig_ep(self)

    def decode_bins_ep(self, nbins):
        stats[state["cat"]] += nbins
        return orig_eps(self, nbins)

    def decode_bin_trm(self):
        stats[state["cat"]] += 1.0
        return orig_trm(self)

    cabac.CabacDecoder.decode_bin = decode_bin
    cabac.CabacDecoder.decode_bin_ep = decode_bin_ep
    cabac.CabacDecoder.decode_bins_ep = decode_bins_ep
    cabac.CabacDecoder.decode_bin_trm = decode_bin_trm

    def tag(fname, cat):
        fn = getattr(syntax, fname, None)
        if fn is None:
            return

        def wrapped(*a, **k):
            prev = state["cat"]
            state["cat"] = cat
            try:
                return fn(*a, **k)
            finally:
                state["cat"] = prev

        setattr(syntax, fname, wrapped)

    tag("_dec_sao_ctu", "sao")
    tag("_dec_cu_p", "cu_mode")
    tag("_dec_cu_b", "cu_mode")
    tag("_dec_cu", "cu_mode")
    tag("_dec_transform_tree_p", "cbf")
    tag("_dec_transform_tree", "cbf")
    tag("_dec_mvd", "mvd")
    tag("_dec_merge_idx", "merge_idx")
    tag("_dec_ref_idx", "ref_idx")

    orig_res = residual.decode_residual

    def res_wrapped(dec, log2, is_luma, *a, **k):
        prev = state["cat"]
        state["cat"] = "res_y" if is_luma else "res_c"
        try:
            return orig_res(dec, log2, is_luma, *a, **k)
        finally:
            state["cat"] = prev

    residual.decode_residual = res_wrapped
    syntax.decode_residual = res_wrapped

    # capture per-frame decision maps from the returned FrameSyntax
    # (decoder.py binds the name at import time — patch it there too)
    from tpuhevc.codec import decoder as dec_mod

    orig_slice = syntax.decode_slice_data

    def slice_wrapped(*a, **k):
        fs = orig_slice(*a, **k)
        decisions.append(fs)
        return fs

    syntax.decode_slice_data = slice_wrapped
    dec_mod.decode_slice_data = slice_wrapped
    return state


def fs_stats(fs, acc):
    h8, w8 = fs.cu_log2.shape
    ncu = 0
    for lg in (3, 4, 5, 6):
        n = int(((fs.cu_log2 == lg).sum()) >> (2 * (lg - 3)))
        acc[f"cu{1 << lg}"] += n
        ncu += n
    acc["ncu"] += ncu
    # per-CU skip/merge (maps replicate across cells; weight by CU count)
    wcu = 4.0 ** (3 - fs.cu_log2)
    acc["skip"] += float((fs.skip * wcu).sum())
    acc["merge"] += float((fs.merge_flag * wcu).sum())
    # TU-split: leaf TU smaller than its CU (use the 4-cell maps)
    cu4 = np.repeat(np.repeat(fs.cu_log2, 2, 0), 2, 1)
    tu = fs.tu_log2
    valid = tu >= 2
    acc["tu_cells"] += int(valid.sum())
    acc["tu_split_cells"] += int((valid & (tu < np.minimum(cu4, 5))).sum())
    for lg in (2, 3, 4, 5):
        acc[f"tu{1 << lg}"] += int(((tu == lg).sum()) >> (2 * (lg - 2)))
    acc["nz_y"] += int((fs.coeff_y != 0).sum())
    acc["nz_c"] += int((fs.coeff_cb != 0).sum() + (fs.coeff_cr != 0).sum())
    acc["sum_abs_y"] += int(np.abs(fs.coeff_y).sum())
    acc["frames"] += 1


def profile(path):
    stats: dict = defaultdict(float)
    decisions: list = []
    install(stats, decisions)

    from tpuhevc.codec.decoder import decode_stream

    with open(path, "rb") as f:
        data = f.read()
    frames = decode_stream(data, with_hash_check=False)
    nbytes = len(data)

    acc: dict = defaultdict(float)
    for fs in decisions:
        fs_stats(fs, acc)

    print(f"\n== {path}: {nbytes} bytes, {len(frames)} pictures ==")
    tot = sum(stats.values())
    for cat, bits in sorted(stats.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:10s} {bits:10.0f} bits ({100*bits/tot:5.1f}%)")
    ncu = max(acc["ncu"], 1)
    print(f"  CUs: " + "  ".join(
        f"{k[2:]}px {100*acc[k]/ncu:.1f}%" for k in
        ("cu8", "cu16", "cu32", "cu64")))
    print(f"  skip {100*acc['skip']/ncu:.1f}%  merge(non-skip) "
          f"{100*acc['merge']/ncu:.1f}%")
    ntu = sum(acc[f"tu{1 << lg}"] for lg in (2, 3, 4, 5))
    if ntu:
        print(f"  TUs: " + "  ".join(
            f"{1 << lg}px {100*acc[f'tu{1 << lg}']/ntu:.1f}%"
            for lg in (2, 3, 4, 5))
            + f"   (cells under an explicit split: "
            f"{100*acc['tu_split_cells']/max(acc['tu_cells'],1):.1f}%)")
    print(f"  nonzero coeffs: Y {acc['nz_y']:.0f} (sum|l| "
          f"{acc['sum_abs_y']:.0f})  C {acc['nz_c']:.0f}")


def main():
    for path in sys.argv[1:]:
        profile(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
