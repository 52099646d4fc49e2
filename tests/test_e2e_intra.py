"""End-to-end: encode -> our decoder (MD5) -> HM reference decoder (oracle).

The HM oracle binary is built from the read-only reference mount by
tools/build_ref_binaries.sh; oracle checks skip if it isn't present.
"""

import os
import subprocess

import numpy as np
import pytest

from tpuhevc.codec.decoder import decode_stream
from tpuhevc.codec.encoder import Encoder
from tpuhevc.codec.params import EncoderConfig, SeqParams

HM_DEC = "/tmp/hmref/TAppDecoder"


def _test_frame(w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    y = np.clip(
        120 + 70 * np.sin(xx / 23.0) + 40 * np.cos(yy / 17.0)
        + rng.integers(-12, 13, (h, w)), 0, 255,
    ).astype(np.uint8)
    u = np.clip(128 + 40 * np.sin(xx[::2, ::2] / 31.0), 0, 255).astype(np.uint8)
    v = np.clip(128 + 40 * np.cos(yy[::2, ::2] / 29.0), 0, 255).astype(np.uint8)
    return y, u, v


def _encode(w, h, qp=32, nframes=1, frame_encoder=None):
    cfg = EncoderConfig(
        sps=SeqParams(width=w, height=h, max_tu_depth_intra=0), qp=qp
    )
    enc = Encoder(cfg, frame_encoder=frame_encoder)
    recs = []
    for i in range(nframes):
        enc.encode_frame(*_test_frame(w, h, seed=i), poc=i)
        recs.append(enc._recon)
    return enc.bitstream(), recs


def _check_own_decoder(bs, recs):
    frames = decode_stream(bs)
    assert len(frames) == len(recs)
    for f, (ry, ru, rv) in zip(frames, recs):
        assert f.md5_ok is True
        assert (f.y == ry).all() and (f.u == ru).all() and (f.v == rv).all()


def _check_hm(bs, tmp_path):
    if not os.path.exists(HM_DEC):
        pytest.skip("HM oracle decoder not built")
    p = tmp_path / "t.bin"
    p.write_bytes(bs)
    out = subprocess.run(
        [HM_DEC, "-b", str(p), "-o", str(tmp_path / "o.yuv")],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "(OK)" in out.stdout
    assert "ERROR" not in out.stdout


def test_e2e_64x64(tmp_path):
    bs, recs = _encode(64, 64, qp=32, nframes=2)
    _check_own_decoder(bs, recs)
    _check_hm(bs, tmp_path)


def test_e2e_partial_ctus(tmp_path):
    # 104x72: both dimensions force implicit quadtree splits at borders
    bs, recs = _encode(104, 72, qp=27)
    _check_own_decoder(bs, recs)
    _check_hm(bs, tmp_path)


def test_e2e_qp_sweep(tmp_path):
    for qp in (22, 37):
        bs, recs = _encode(64, 64, qp=qp)
        _check_own_decoder(bs, recs)
        _check_hm(bs, tmp_path)


def test_e2e_jax_encoder(tmp_path):
    from tpuhevc.codec.intra_jax import encode_frame_intra_jax

    bs, recs = _encode(104, 72, qp=32, frame_encoder=encode_frame_intra_jax)
    _check_own_decoder(bs, recs)
    _check_hm(bs, tmp_path)


def test_jax_matches_host_path():
    from tpuhevc.codec.intra_jax import encode_frame_intra_jax
    from tpuhevc.codec.recon import encode_frame_intra

    y, u, v = _test_frame(128, 64, seed=3)
    cfg = EncoderConfig(
        sps=SeqParams(width=128, height=64, max_tu_depth_intra=0), qp=32
    )
    fs_h, rec_h = encode_frame_intra(y, u, v, cfg)
    fs_j, rec_j = encode_frame_intra_jax(y, u, v, cfg)
    assert (fs_h.luma_mode == fs_j.luma_mode).all()
    assert (fs_h.coeff_y == fs_j.coeff_y).all()
    assert (fs_h.coeff_cb == fs_j.coeff_cb).all()
    assert (fs_h.coeff_cr == fs_j.coeff_cr).all()
    for a, b in zip(rec_h, rec_j):
        assert (a == b).all()
