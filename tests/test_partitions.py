"""Rectangular inter partitions (2NxN / Nx2N) in the own encoder.

The native decision walk derives per-PU merge/AMVP syntax in the same
progressive order the decoder replays (TEncCu PU loop,
TComDataCU::getInterMergeCandidates availability step); the python
syntax encoder codes the walk's decisions; the decoder must reproduce
the per-4-cell motion field exactly.
"""

import numpy as np

from tpuhevc.codec.params import P_SLICE, PicParams, SeqParams
from tpuhevc.entropy import bitio
from tpuhevc.entropy.cabac import CabacDecoder, CabacEncoder, ContextSet
from tpuhevc.entropy.native import decision_walk_map_native, get_lib
from tpuhevc.entropy.syntax import (FrameSyntax, decode_slice_data,
                                    encode_slice_data)

import pytest


def _build_maps():
    W, H = 64, 32
    h8, w8 = H // 8, W // 8
    log2_map = np.full((h8, w8), 4, np.uint8)
    mv8 = np.zeros((h8, w8, 2), np.int32)
    ref8 = np.zeros((h8, w8), np.uint8)
    cbf8 = np.zeros((h8, w8), np.uint8)
    part8 = np.zeros((h8, w8), np.uint8)
    mv8[:, :] = (4, 0)
    # CU at (16, 0): 2NxN, top PU (8, 0), bottom PU (0, -4)
    part8[0, 2] = 1
    mv8[0, 2:4] = (8, 0)
    mv8[1, 2:4] = (0, -4)
    # CU at (32, 0): Nx2N, left PU (-12, 4), right PU (16, 8)
    part8[0, 4] = 2
    mv8[0:2, 4] = (-12, 4)
    mv8[0:2, 5] = (16, 8)
    return W, H, log2_map, mv8, ref8, cbf8, part8


def test_partition_walk_syntax_roundtrip():
    if get_lib() is None:
        pytest.skip("native library unavailable")
    W, H, log2_map, mv8, ref8, cbf8, part8 = _build_maps()
    maps = decision_walk_map_native(log2_map, mv8, ref8, cbf8, W, H, 6, 5,
                                    num_ref=1, part_map=part8)
    assert maps is not None
    # walk must keep per-PU motion intact in the 8-cell maps
    assert (maps["mv"] == mv8).all()
    # partitioned CUs are never skip
    assert not maps["skip"][part8 > 0].any()

    sps = SeqParams(width=W, height=H)
    fs = FrameSyntax(
        W, H, cu_log2=maps["cu_log2"], mv=maps["mv"], skip=maps["skip"],
        merge_flag=maps["merge_flag"], merge_idx=maps["merge_idx"],
        mvp_flag=maps["mvp_flag"], mvd=maps["mvd"], ref_idx=maps["ref"])
    fs.part_mode = part8
    pps = PicParams()
    ctx_e = ContextSet(1, 32)
    enc = CabacEncoder(ctx_e)
    encode_slice_data(enc, fs, sps, pps, P_SLICE, 5, num_ref=1,
                      ref_deltas=[-1])
    enc.finish()
    w = bitio.BitWriter()
    w.write_bytes(bytes(enc.out))
    val, nbits = enc.pending_bits
    w.write(val, nbits)
    w.rbsp_trailing_bits()
    data = w.getvalue()

    ctx_d = ContextSet(1, 32)
    dec = CabacDecoder(data, ctx_d)
    got = decode_slice_data(dec, sps, pps, W, H, P_SLICE, 5, num_ref=1,
                            ref_deltas=[-1])
    assert ctx_e.states == ctx_d.states
    # per-4-cell motion: each PU's mv replicated over its own half only
    exp4 = np.repeat(np.repeat(mv8, 2, 0), 2, 1)
    assert (got.mv4 == exp4).all()
    assert (got.ref4 == np.repeat(np.repeat(ref8, 2, 0), 2, 1)).all()


def test_partition_walk_progressive_availability():
    """PU1 of an Nx2N CU must see PU0 (left half) as its AMVP/merge
    left neighbor even though PU0's bottom cells z-follow PU1's origin
    (the availability rule codec/mv.py _neighbor documents)."""
    if get_lib() is None:
        pytest.skip("native library unavailable")
    W, H = 32, 32
    h8 = w8 = 4
    log2_map = np.full((h8, w8), 5, np.uint8)
    mv8 = np.zeros((h8, w8, 2), np.int32)
    ref8 = np.zeros((h8, w8), np.uint8)
    cbf8 = np.zeros((h8, w8), np.uint8)
    part8 = np.zeros((h8, w8), np.uint8)
    part8[0, 0] = 2  # one 32x32 Nx2N CU
    mv8[:, 0:2] = (-8, 0)
    mv8[:, 2:4] = (-8, 0)  # PU1 identical to PU0
    maps = decision_walk_map_native(log2_map, mv8, ref8, cbf8, W, H, 6, 5,
                                    num_ref=1, part_map=part8)
    assert maps is not None
    # PU1 == PU0 motion: A1 (PU0) is excluded by the availability step,
    # so PU1 may still merge via another position or fall to AMVP with a
    # zero mvd — either way motion must round-trip
    assert (maps["mv"] == mv8).all()
