"""Deblocking filter: e2e conformance (HM oracle validates our filter
bit-exactly — any deviation breaks the decoded-picture MD5) + unit sanity."""

import os
import subprocess

import numpy as np
import pytest

from tpuhevc.codec.decoder import decode_stream
from tpuhevc.codec.encoder import Encoder
from tpuhevc.codec.params import EncoderConfig, SeqParams

from test_e2e_inter import _moving_clip

HM_DEC = "/tmp/hmref/TAppDecoder"


def _run(w, h, n, qp, intra_period, tmp_path):
    cfg = EncoderConfig(
        sps=SeqParams(width=w, height=h, max_tu_depth_intra=0),
        qp=qp, intra_period=intra_period, fme_mode="none", deblocking=True,
    )
    enc = Encoder(cfg)
    for i, fr in enumerate(_moving_clip(w, h, n, seed=qp)):
        enc.encode_frame(*fr, poc=i)
    bs = enc.bitstream()
    frames = decode_stream(bs)
    assert all(f.md5_ok for f in frames)
    if os.path.exists(HM_DEC):
        p = tmp_path / "t.bin"
        p.write_bytes(bs)
        out = subprocess.run(
            [HM_DEC, "-b", str(p), "-o", str(tmp_path / "o.yuv")],
            capture_output=True, text=True, timeout=120,
        )
        assert out.stdout.count("(OK)") == n and "ERROR" not in out.stdout
    return enc


def test_deblock_intra_conformance(tmp_path):
    _run(128, 64, 2, 32, 1, tmp_path)


def test_deblock_ldp_conformance(tmp_path):
    _run(128, 64, 5, 27, -1, tmp_path)


def test_deblock_qp_sweep(tmp_path):
    for qp in (22, 37):
        _run(64, 64, 2, qp, -1, tmp_path)


def test_deblock_smooths_block_edges():
    """A blocky quantized frame must have smaller cross-edge gradients
    after the filter."""
    from tpuhevc.entropy.syntax import FrameSyntax
    from tpuhevc.ops.deblock import deblock_frame

    rng = np.random.default_rng(0)
    w = h = 64
    y = np.zeros((h, w), dtype=np.int32)
    # constant-per-8x8-block image: ideal blocking artifact
    for by in range(8):
        for bx in range(8):
            y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = rng.integers(90, 160)
    u = np.full((32, 32), 128)
    v = np.full((32, 32), 128)
    fs = FrameSyntax(w, h)  # all-8x8 CUs, intra
    fy, fu, fv = deblock_frame((y, u, v), fs, 37, True)
    edge_grad = lambda p: np.abs(
        p[:, 8:-8:8].astype(int) - p[:, 7:-9:8].astype(int)
    ).mean()
    assert edge_grad(fy) < edge_grad(y)
    # block interiors (away from any 8-grid edge) untouched
    assert (fy[4, 4] == y[4, 4]) and (fy[20, 20] == y[20, 20])


def test_pcm_mask_keeps_pcm_samples_unfiltered():
    """pcm_loop_filter_disabled_flag=1: I_PCM CU samples bypass deblocking
    (TComLoopFilter per-sample noFilter); samples far from the PCM CU are
    unaffected by the masking."""
    from tpuhevc.entropy.syntax import FrameSyntax
    from tpuhevc.ops.deblock import deblock_frame, pcm_sample_mask

    rng = np.random.default_rng(7)
    w = h = 64
    fs = FrameSyntax(w, h)
    fs.cu_log2[:] = 4
    fs.luma_mode[:] = 1  # DC intra everywhere -> BS=2 on CU edges
    fs.pcm_blocks[(2, 2)] = None  # 16x16 PCM CU at (16,16)
    # flat 16x16 blocks at distinct DC levels: smooth interiors + step
    # edges are exactly what deblocking filters
    def blocky(ph, pw, bs):
        lv = rng.integers(40, 216, (ph // bs, pw // bs))
        return np.repeat(np.repeat(lv, bs, 0), bs, 1).astype(np.int32)

    planes = (blocky(h, w, 16), blocky(h // 2, w // 2, 8),
              blocky(h // 2, w // 2, 8))
    mask = pcm_sample_mask(fs)
    assert mask[0][16:32, 16:32].all() and mask[0].sum() == 256
    plain = deblock_frame(planes, fs, 32, True)
    kept = deblock_frame(planes, fs, 32, True, pcm_mask=mask)
    # PCM samples untouched
    assert (kept[0][16:32, 16:32] == planes[0][16:32, 16:32]).all()
    assert (kept[1][8:16, 8:16] == planes[1][8:16, 8:16]).all()
    # deblocking did modify that region in the unmasked run
    assert (plain[0][16:32, 16:32] != planes[0][16:32, 16:32]).any()
    # samples >4px away from the PCM CU are identical in both runs
    assert (kept[0][40:, 40:] == plain[0][40:, 40:]).all()
