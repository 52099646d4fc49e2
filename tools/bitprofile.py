#!/usr/bin/env python
"""Per-syntax-category bit profile of an encode (np backend).

Counterpart of the reference's decoder bit-statistics build
(RExt__DECODER_DEBUG_BIT_STATISTICS, TComCodingStatistics.h — SURVEY.md
§4.4): fractional bits actually spent per syntax group, accumulated in
the real CABAC encoder from the per-bin context state. Used to target RD
work: run before/after a change to see which category moved.

Usage: python tools/bitprofile.py [--qp 32] [--frames 12] [--width 192]
           [--height 128] [--clip /path.yuv]
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def install_profiler():
    """Wrap CabacEncoder bin coders + syntax entry points with category
    accounting. Returns the stats dict {slice_type: {cat: frac_bits}}."""
    from tpuhevc.entropy import cabac, residual, syntax
    from tpuhevc.entropy.cabac import _EBITS

    stats: dict = defaultdict(lambda: defaultdict(float))
    state = dict(cat="other", stype="?")

    orig_bin = cabac.CabacEncoder.encode_bin
    orig_ep = cabac.CabacEncoder.encode_bin_ep
    orig_eps = cabac.CabacEncoder.encode_bins_ep
    orig_trm = cabac.CabacEncoder.encode_bin_trm

    def encode_bin(self, binval, ctx_idx):
        s = self.ctx.states[ctx_idx]
        stats[state["stype"]][state["cat"]] += _EBITS[s ^ binval] / 32768.0
        orig_bin(self, binval, ctx_idx)

    def encode_bin_ep(self, binval):
        stats[state["stype"]][state["cat"]] += 1.0
        orig_ep(self, binval)

    def encode_bins_ep(self, value, nbins):
        stats[state["stype"]][state["cat"]] += nbins
        orig_eps(self, value, nbins)

    def encode_bin_trm(self, binval):
        stats[state["stype"]][state["cat"]] += 1.0
        orig_trm(self, binval)

    cabac.CabacEncoder.encode_bin = encode_bin
    cabac.CabacEncoder.encode_bin_ep = encode_bin_ep
    cabac.CabacEncoder.encode_bins_ep = encode_bins_ep
    cabac.CabacEncoder.encode_bin_trm = encode_bin_trm

    def tag(module, fname, cat):
        fn = getattr(module, fname)

        def wrapped(*a, **k):
            prev = state["cat"]
            state["cat"] = cat
            try:
                return fn(*a, **k)
            finally:
                state["cat"] = prev

        setattr(module, fname, wrapped)

    tag(syntax, "_enc_sao_ctu", "sao")
    tag(syntax, "_enc_cu_p", "cu_mode")
    tag(syntax, "_enc_cu_b", "cu_mode")
    tag(syntax, "_enc_cu", "cu_mode")
    tag(syntax, "_enc_transform_tree_p", "cbf")
    tag(syntax, "_enc_transform_tree", "cbf")
    tag(syntax, "_enc_mvd", "mvd")
    tag(syntax, "_enc_merge_idx", "merge_idx")
    tag(syntax, "_enc_ref_idx", "ref_idx")

    orig_res = residual.encode_residual

    def res_wrapped(enc, blk, log2, is_luma, *a, **k):
        prev = state["cat"]
        state["cat"] = "res_y" if is_luma else "res_c"
        try:
            return orig_res(enc, blk, log2, is_luma, *a, **k)
        finally:
            state["cat"] = prev

    residual.encode_residual = res_wrapped
    # syntax.py imported the name directly
    syntax.encode_residual = res_wrapped
    return stats, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qp", type=int, default=32)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--clip", default=None)
    args = ap.parse_args()

    stats, state = install_profiler()

    import numpy as np

    from tools.make_test_clip import make_clip
    from tpuhevc.codec.encoder import encode_sequence
    from tpuhevc.codec.params import I_SLICE
    from tpuhevc.config.options import build_config, parse_cfg_file
    from tpuhevc.utils.yuv import YuvReader

    w, h, n = args.width, args.height, args.frames
    clip = args.clip
    if clip is None:
        clip = f"/tmp/clip{w}x{h}x{n}.yuv"
        with open(clip, "wb") as f:
            f.write(make_clip(w, h, n))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    opts = parse_cfg_file(os.path.join(repo, "cfg",
                                       "encoder_lowdelay_P_main.cfg"))
    opts.update(SourceWidth=str(w), SourceHeight=str(h), QP=str(args.qp))
    cfg, _ = build_config(opts)
    cfg.inter_backend = "np"

    enc = None

    # tag slice types by wrapping the Encoder's per-frame finish
    from tpuhevc.codec import encoder as enc_mod

    orig_encode_frame = enc_mod.Encoder.encode_frame

    def encode_frame(self, *a, **k):
        poc = k.get("poc", 0)
        si = k.get("slice_info")
        stype = self._slice_type(poc) if si is None else si["stype"]
        state["stype"] = "I" if stype == I_SLICE else "PB"
        return orig_encode_frame(self, *a, **k)

    enc_mod.Encoder.encode_frame = encode_frame

    enc, _ = encode_sequence(YuvReader(clip, w, h, cfg.sps.bit_depth), cfg,
                             max_frames=n)
    total_bits = sum(r.bits for r in enc.results)
    print(f"total {total_bits} bits "
          f"({np.mean([r.psnr_y for r in enc.results]):.3f} dB Y)")
    for stype, cats in sorted(stats.items()):
        st = sum(cats.values())
        print(f"-- {stype}: {st:.0f} CABAC bits")
        for cat, bits in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"   {cat:10s} {bits:10.1f}  ({100*bits/st:5.1f}%)")


if __name__ == "__main__":
    main()
