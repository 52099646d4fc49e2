"""Main10 (10-bit) conformance: AI + LD-P, self-decode + HM oracle."""

import os
import subprocess

import numpy as np
import pytest

from tools.make_test_clip import make_clip
from tpuhevc.codec.decoder import decode_stream
from tpuhevc.codec.encoder import encode_sequence
from tpuhevc.codec.params import EncoderConfig, SeqParams

HM_DEC = "/tmp/hmref/TAppDecoder"


def _clip10(w, h, n):
    raw = make_clip(w, h, n)
    fsz = w * h * 3 // 2
    out = []
    for i in range(n):
        b = np.frombuffer(raw[i * fsz : (i + 1) * fsz], np.uint8)
        out.append((
            np.clip(b[: w * h].reshape(h, w).astype(np.uint16) * 4 + 2,
                    0, 1023),
            np.clip(b[w * h : w * h * 5 // 4].reshape(h // 2, w // 2)
                    .astype(np.uint16) * 4 + 1, 0, 1023),
            np.clip(b[w * h * 5 // 4 :].reshape(h // 2, w // 2)
                    .astype(np.uint16) * 4 + 3, 0, 1023)))
    return out


@pytest.mark.parametrize("ip", [1, -1])
def test_main10(ip, tmp_path):
    clip = _clip10(128, 64, 4)
    sps = SeqParams(width=128, height=64, max_tu_depth_intra=0,
                    bit_depth=10, profile_idc=2)
    cfg = EncoderConfig(sps=sps, qp=30, intra_period=ip, fme_mode="none",
                        inter_backend="np")

    class R:
        def read_frame(self, i):
            return clip[i] if i < len(clip) else None

    enc, _ = encode_sequence(R(), cfg, max_frames=4)
    bs = enc.bitstream()
    frames = decode_stream(bs)
    assert all(f.md5_ok for f in frames)
    assert all(f.y.max() > 255 for f in frames)  # really 10-bit content
    if os.path.exists(HM_DEC):
        p = tmp_path / "m10.bin"
        p.write_bytes(bs)
        out = subprocess.run([HM_DEC, "-b", str(p)], capture_output=True,
                             text=True, timeout=120).stdout
        assert out.count("(OK)") == 4 and "ERROR" not in out
