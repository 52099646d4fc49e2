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


def _hm_encode(tmp_path, cfg, frames, qp=32, w=192, h=128, extra=(),
               raw=None):
    if not os.path.exists(HM_ENC) or not os.path.exists(cfg):
        pytest.skip("HM oracle encoder not built")
    from tools.make_test_clip import make_clip

    yuv = tmp_path / "clip.yuv"
    yuv.write_bytes(raw if raw is not None else make_clip(w, h, frames))
    out = tmp_path / "str.bin"
    r = subprocess.run(
        [HM_ENC, "-c", cfg, "-i", str(yuv), "-wdt", str(w), "-hgt",
         str(h), "-f", str(frames), "-fr", "50", "-q", str(qp), "-b",
         str(out), "--ConformanceWindowMode=1", "--Level=4.1",
         "--SEIDecodedPictureHash=1", *extra],
        input=b"\n", capture_output=True, timeout=600)
    assert r.returncode == 0, r.stdout.decode(errors="replace")
    return out.read_bytes()


def _half_noise_clip(w, h, n, seed=3):
    """Left half pure noise (PCM territory at low QP), right half a
    smooth gradient (regular intra territory)."""
    rng = np.random.default_rng(seed)
    out = bytearray()
    yy, xx = np.mgrid[0:h, 0:w]
    grad = ((xx * 2 + yy) % 256).astype(np.uint8)
    for _ in range(n):
        y = grad.copy()
        y[:, : w // 2] = rng.integers(0, 256, (h, w // 2), dtype=np.uint8)
        u = np.full((h // 2, w // 2), 128, np.uint8)
        u[:, : w // 4] = rng.integers(0, 256, (h // 2, w // 4),
                                      dtype=np.uint8)
        v = u[::-1].copy()
        out += y.tobytes() + u.tobytes() + v.tobytes()
    return bytes(out)


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


@pytest.mark.oracle
def test_decode_hm_ldp_12frames_partitions(tmp_path):
    """12-frame LD-P streams exercising AMP/2NxN partitions, TMVP, RQT,
    per-PU motion, cabac_init_flag table swaps and intra CUs in P slices."""
    for qp in (22, 27, 32, 37):
        bs = _hm_encode(tmp_path, REF_CFG_LDP, frames=12, qp=qp)
        fr = decode_stream(bs)
        assert len(fr) == 12
        assert all(f.md5_ok for f in fr), qp


@pytest.mark.oracle
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


def _count_pcm(bs):
    """Decode, counting I_PCM CUs via the parse hook."""
    import tpuhevc.entropy.syntax as syn

    orig = syn._dec_pcm_cu
    cnt = [0]

    def spy(*a):
        cnt[0] += 1
        return orig(*a)

    syn._dec_pcm_cu = spy
    try:
        fr = decode_stream(bs)
    finally:
        syn._dec_pcm_cu = orig
    return fr, cnt[0]


def test_decode_hm_pcm_intra(tmp_path):
    """I_PCM CUs (pcm_flag terminating bin + byte-aligned raw samples +
    CABAC restart, TDecSbac::parseIPCMInfo TDecSbac.cpp:364-404) inside
    all-intra streams: half-noise clip at low QP makes HM pick PCM on
    the noise half and regular intra on the gradient half."""
    raw = _half_noise_clip(64, 64, 2)
    bs = _hm_encode(
        tmp_path, REF_CFG_AI, frames=2, qp=5, w=64, h=64, raw=raw,
        extra=("--PCMEnabledFlag=1", "--PCMLog2MaxSize=5",
               "--PCMLog2MinSize=3"))
    fr, pcm = _count_pcm(bs)
    assert pcm > 0, "stream never exercised PCM; test is vacuous"
    assert len(fr) == 2 and all(f.md5_ok for f in fr)


def test_decode_hm_pcm_ldp(tmp_path):
    """PCM CUs appearing as intra CUs inside P slices (same parse, via
    the pred_mode_flag=intra route), plus regular inter CUs around."""
    raw = _half_noise_clip(64, 64, 4, seed=9)
    bs = _hm_encode(
        tmp_path, REF_CFG_LDP, frames=4, qp=5, w=64, h=64, raw=raw,
        extra=("--PCMEnabledFlag=1", "--PCMLog2MaxSize=5",
               "--PCMLog2MinSize=3"))
    fr, pcm = _count_pcm(bs)
    assert pcm > 0, "stream never exercised PCM; test is vacuous"
    assert len(fr) == 4 and all(f.md5_ok for f in fr)
