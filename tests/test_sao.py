"""SAO: classification unit checks vs a scalar transcription, stats/apply
consistency, and end-to-end conformance (self-decode + HM oracle)."""

import os
import subprocess

import numpy as np
import pytest

from tools.make_test_clip import make_clip
from tpuhevc.codec.decoder import decode_stream
from tpuhevc.codec.encoder import encode_sequence
from tpuhevc.codec.params import EncoderConfig, SeqParams
from tpuhevc.ops import sao as sao_ops

HM_DEC = "/tmp/hmref/TAppDecoder"


def test_eo_category_scalar_parity():
    rng = np.random.default_rng(3)
    p = rng.integers(0, 256, (16, 24)).astype(np.int32)
    for klass, ((dy0, dx0), (dy1, dx1)) in sao_ops.EO_NEIGHBORS.items():
        cat, valid = sao_ops.eo_category(p, klass)
        h, w = p.shape
        lut = [1, 2, 0, 3, 4]
        for y in range(h):
            for x in range(w):
                n0y, n0x = y + dy0, x + dx0
                n1y, n1x = y + dy1, x + dx1
                inb = (0 <= n0y < h and 0 <= n0x < w
                       and 0 <= n1y < h and 0 <= n1x < w)
                assert valid[y, x] == inb
                if inb:
                    et = (int(np.sign(p[y, x] - p[n0y, n0x]))
                          + int(np.sign(p[y, x] - p[n1y, n1x])))
                    assert cat[y, x] == lut[et + 2], (klass, y, x)


def test_apply_matches_stats_model():
    """dD predicted from stats == actual SSE change when applying offsets."""
    rng = np.random.default_rng(5)
    org = rng.integers(0, 256, (64, 64)).astype(np.int32)
    rec = np.clip(org + rng.integers(-6, 7, org.shape), 0, 255).astype(np.int32)
    st = sao_ops.collect_stats(org, rec, 64)
    klass = 2
    off4 = np.array([1, 1, 1, 1], np.int32)
    types = np.array([[klass]])
    out = sao_ops.apply_sao_plane(rec, types, np.array([[0]]), off4[None, None],
                                  64)
    d_before = ((org - rec) ** 2).sum()
    d_after = ((org - out) ** 2).sum()
    pred = 0
    for cat in range(4):
        h = int(off4[cat]) * (1 if cat < 2 else -1)
        pred += (int(st["eo_count"][0, 0, klass, cat]) * h * h
                 - 2 * h * int(st["eo_sum"][0, 0, klass, cat]))
    # exact unless clipping at 0/255 interferes; allow small slack
    assert abs((d_after - d_before) - pred) <= 8 * 255


def _clip(w, h, n):
    raw = make_clip(w, h, n)
    fsz = w * h * 3 // 2
    out = []
    for i in range(n):
        b = np.frombuffer(raw[i * fsz : (i + 1) * fsz], dtype=np.uint8)
        out.append((b[: w * h].reshape(h, w),
                    b[w * h : w * h * 5 // 4].reshape(h // 2, w // 2),
                    b[w * h * 5 // 4 :].reshape(h // 2, w // 2)))
    return out


class _Reader:
    def __init__(self, clip):
        self.clip = clip

    def read_frame(self, i):
        return self.clip[i] if i < len(self.clip) else None


@pytest.mark.parametrize("ip", [1, -1])
def test_sao_e2e(ip, tmp_path):
    clip = _clip(128, 64, 3)
    sps = SeqParams(width=128, height=64, max_tu_depth_intra=0,
                    sao_enabled=True)
    cfg = EncoderConfig(sps=sps, qp=30, intra_period=ip, fme_mode="none",
                        inter_backend="np", deblocking=True)
    enc, _ = encode_sequence(_Reader(clip), cfg, max_frames=3)
    bs = enc.bitstream()
    frames = decode_stream(bs)
    assert all(f.md5_ok for f in frames)
    # SAO should actually engage somewhere
    assert any(f is not None for f in [enc.results])
    if os.path.exists(HM_DEC):
        p = tmp_path / "sao.bin"
        p.write_bytes(bs)
        out = subprocess.run([HM_DEC, "-b", str(p)], capture_output=True,
                             text=True, timeout=120).stdout
        assert out.count("(OK)") == 3 and "ERROR" not in out
