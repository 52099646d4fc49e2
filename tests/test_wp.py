"""Weighted prediction: estimation golden vs the HM anchor, syntax
roundtrip, apply-math identities, and foreign WP stream conformance
(WeightPredAnalysis.cpp / TComWeightPrediction.cpp counterparts)."""

import os
import subprocess

import numpy as np
import pytest

from tools.make_test_clip import make_fade_clip
from tpuhevc.codec.wp import (WpParams, analyse_slice_wp, calc_acdc,
                              estimate_wp, weight_bi_np, weight_fullpel_np,
                              weight_uni_np)

HM_ENC = "/tmp/hmref/TAppEncoder"
REF_CFG_LDP = "/root/reference/cfg/encoder_lowdelay_P_main.cfg"

W, H, N = 192, 128, 8


def _frames():
    data = make_fade_clip(W, H, N)
    fsz = W * H * 3 // 2
    out = []
    for i in range(N):
        b = np.frombuffer(data[i * fsz : (i + 1) * fsz], np.uint8)
        out.append((b[: W * H].reshape(H, W).astype(np.int32),
                    b[W * H : W * H * 5 // 4].reshape(H // 2, W // 2)
                    .astype(np.int32),
                    b[W * H * 5 // 4 :].reshape(H // 2, W // 2)
                    .astype(np.int32)))
    return out


def test_estimate_matches_hm_golden():
    """Golden values read from the pred_weight_table the HM anchor codes
    on the same fade clip (denom 6 single-ref, denom 7 at 4 refs)."""
    fr = _frames()
    wp = estimate_wp(calc_acdc(*fr[1]), [calc_acdc(*fr[0])], 8, 1)
    assert wp.denom_y == 6
    assert wp.weights == [[68, 69, 68]]
    assert wp.offsets == [[7, -9, -9]]

    refs = [calc_acdc(*fr[i]) for i in (3, 2, 1, 0)]
    wp = estimate_wp(calc_acdc(*fr[4]), refs, 8, 4)
    assert wp.denom_y == 7
    assert wp.weights[0] == [135, 136, 134]
    assert wp.weights[3] == [162, 164, 159]
    assert wp.offsets[3] == [24, -32, -34]


def test_select_keeps_fade_drops_static():
    fr = _frames()
    wp = analyse_slice_wp(fr[4], [fr[3]])
    assert wp.flags[0] == [1, 1]  # fade: WP wins the SAD compare
    wp2 = analyse_slice_wp(fr[3], [fr[3]])  # identical pictures
    assert wp2.flags[0] == [0, 0]


def test_weight_identity_reduces_to_default_rounding():
    rng = np.random.default_rng(0)
    p14 = rng.integers(0, 1 << 14, (64,), np.int64)
    from tpuhevc.ops.interp import bi_average_np, uni_from14_np

    for denom in (0, 1, 6, 7):
        got = weight_uni_np(p14, 1 << denom, 0, denom)
        np.testing.assert_array_equal(got, uni_from14_np(p14))
    a = rng.integers(0, 1 << 14, (64,), np.int64)
    b = rng.integers(0, 1 << 14, (64,), np.int64)
    for denom in (6, 7):
        got = weight_bi_np(a, b, 1 << denom, 0, 1 << denom, 0, denom)
        np.testing.assert_array_equal(got, bi_average_np(a, b))


def test_fullpel_equals_uni_on_intpel():
    rng = np.random.default_rng(1)
    r = rng.integers(0, 256, (128,), np.int64)
    for w, o, d in ((68, 7, 6), (135, -12, 7), (40, 30, 6)):
        np.testing.assert_array_equal(
            weight_fullpel_np(r, w, o, d),
            weight_uni_np(r << 6, w, o, d))


def test_pred_weight_table_roundtrip():
    from tpuhevc.codec.params import P_SLICE, PicParams, SeqParams
    from tpuhevc.entropy.bitio import BitReader
    from tpuhevc.entropy.headers import (SliceHeader,
                                         parse_pred_weight_table,
                                         write_pred_weight_table)
    from tpuhevc.entropy.bitio import BitWriter

    wp = WpParams(denom_y=7, denom_c=7)
    wp.flags = [[1, 1], [1, 0], [0, 0]]
    wp.weights = [[135, 136, 134], [143, 128, 128], [128, 128, 128]]
    wp.offsets = [[5, -7, -7], [10, 0, 0], [0, 0, 0]]
    hdr = SliceHeader(slice_type=P_SLICE, num_ref_idx_l0=3)
    hdr.wp_l0 = wp
    w = BitWriter()
    write_pred_weight_table(w, hdr)
    w.write(1, 1)
    w.align_zero()
    hdr2 = SliceHeader(slice_type=P_SLICE, num_ref_idx_l0=3)
    parse_pred_weight_table(BitReader(w.getvalue()), hdr2)
    got = hdr2.wp_l0
    assert got.denom_y == 7 and got.denom_c == 7
    assert [list(f) for f in got.flags] == wp.flags
    assert got.weights == wp.weights
    assert got.offsets == wp.offsets


def test_decode_hm_wp_stream(tmp_path):
    """Foreign conformance: the HM anchor with --WeightedPredP=1 on a
    fade clip (FEN off: the fork's weighted SSE asserts on subsampled
    distortion) decodes hash-exact, including the 4-ref denom-7
    slices."""
    if not os.path.exists(HM_ENC):
        pytest.skip("HM oracle encoder not built")
    yuv = tmp_path / "fade.yuv"
    yuv.write_bytes(make_fade_clip(W, H, N))
    out = tmp_path / "wp.bin"
    r = subprocess.run(
        [HM_ENC, "-c", REF_CFG_LDP, "-i", str(yuv), "-wdt", str(W),
         "-hgt", str(H), "-f", str(N), "-fr", "50", "-q", "32", "-b",
         str(out), "--ConformanceWindowMode=1", "--Level=4.1",
         "--SEIDecodedPictureHash=1", "--WeightedPredP=1", "--FEN=0"],
        input=b"\n", capture_output=True, timeout=600)
    assert r.returncode == 0, r.stdout.decode(errors="replace")
    from tpuhevc.codec.decoder import decode_stream

    fr = decode_stream(out.read_bytes())
    assert len(fr) == N
    assert all(f.md5_ok for f in fr)


def test_ref_pic_list_modification_roundtrip():
    """list_entry_l0 write/parse (§7.3.6.2) + cyclic temp-list apply."""
    from tpuhevc.codec.params import P_SLICE, PicParams, SeqParams
    from tpuhevc.entropy.bitio import BitReader
    from tpuhevc.entropy.headers import (ShortTermRPS, SliceHeader,
                                         parse_slice_header,
                                         write_slice_header)

    sps = SeqParams(width=64, height=64)
    pps = PicParams(lists_modification_present=True,
                    num_ref_idx_l0_default=3)
    hdr = SliceHeader(slice_type=P_SLICE, nal_type=1, poc=5, qp=30,
                      rps=ShortTermRPS([-1, -2, -3], [1, 1, 1]),
                      num_ref_idx_l0=3)
    hdr.list_entry_l0 = [2, 0, 1]
    w = write_slice_header(hdr, sps, pps)
    hdr2, _ = parse_slice_header(w.getvalue(), 1, sps, pps, [])
    assert hdr2.list_entry_l0 == [2, 0, 1]
    # unmodified header parses to None
    hdr.list_entry_l0 = None
    w = write_slice_header(hdr, sps, pps)
    hdr3, _ = parse_slice_header(w.getvalue(), 1, sps, pps, [])
    assert hdr3.list_entry_l0 is None
