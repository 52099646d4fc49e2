"""Decode streams produced by the reference HM encoder (the general-
stream decoder: inter-RPS prediction, NxN intra, RQT TU trees, transform
skip, TMVP merge/AMVP candidates). Skips when the HM oracle binaries are
not built (tools/build_ref_binaries.sh)."""

import os
import subprocess

import numpy as np
import pytest

from tpuhevc.codec.decoder import decode_stream

HM_ENC = "/tmp/hmref/TAppEncoder"
REF_CFG_AI = "/root/reference/cfg/encoder_intra_main.cfg"
REF_CFG_LDP = "/root/reference/cfg/encoder_lowdelay_P_main.cfg"
REF_CFG_RA = "/root/reference/cfg/encoder_randomaccess_main.cfg"


def _hm_encode(tmp_path, cfg, frames, qp=32, w=192, h=128):
    if not os.path.exists(HM_ENC) or not os.path.exists(cfg):
        pytest.skip("HM oracle encoder not built")
    from tools.make_test_clip import make_clip

    yuv = tmp_path / "clip.yuv"
    yuv.write_bytes(make_clip(w, h, frames))
    out = tmp_path / "str.bin"
    r = subprocess.run(
        [HM_ENC, "-c", cfg, "-i", str(yuv), "-wdt", str(w), "-hgt",
         str(h), "-f", str(frames), "-fr", "50", "-q", str(qp), "-b",
         str(out), "--ConformanceWindowMode=1", "--Level=4.1",
         "--SEIDecodedPictureHash=1"],
        input=b"\n", capture_output=True, timeout=600)
    assert r.returncode == 0, r.stdout.decode(errors="replace")
    return out.read_bytes()


def test_decode_hm_all_intra(tmp_path):
    bs = _hm_encode(tmp_path, REF_CFG_AI, frames=2)
    fr = decode_stream(bs)
    assert len(fr) == 2
    assert all(f.md5_ok for f in fr)


def test_decode_hm_ldp_gop4_tmvp(tmp_path):
    bs = _hm_encode(tmp_path, REF_CFG_LDP, frames=4)
    fr = decode_stream(bs)
    assert len(fr) == 4
    assert all(f.md5_ok for f in fr)


def test_decode_hm_ldp_12frames_partitions(tmp_path):
    """12-frame LD-P streams exercising AMP/2NxN partitions, TMVP, RQT,
    per-PU motion, cabac_init_flag table swaps and intra CUs in P slices."""
    for qp in (22, 27, 32, 37):
        bs = _hm_encode(tmp_path, REF_CFG_LDP, frames=12, qp=qp)
        fr = decode_stream(bs)
        assert len(fr) == 12
        assert all(f.md5_ok for f in fr), qp


def test_decode_hm_randomaccess(tmp_path):
    """17-frame RA streams (GOP8 hierarchical B, 4 temporal sub-layers,
    reordering, two-list TMVP with collocated_from_l0 switching,
    bi-prediction, mvd_l1_zero on backward-only key B pictures, B-slice
    partitions + RQT, two-list deblock BS)."""
    for qp in (27, 37):
        bs = _hm_encode(tmp_path, REF_CFG_RA, frames=17, qp=qp)
        fr = decode_stream(bs)
        assert len(fr) == 17
        assert all(f.md5_ok for f in fr), qp
        # decode order differs from output order (reordering)
        assert [f.poc for f in fr] != sorted(f.poc for f in fr)
