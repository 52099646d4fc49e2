"""R-lambda rate control: target adherence + conformance."""

import numpy as np

from tools.make_test_clip import make_clip
from tpuhevc.codec.decoder import decode_stream
from tpuhevc.codec.encoder import encode_sequence
from tpuhevc.codec.params import EncoderConfig, SeqParams


def _clip(w, h, n):
    raw = make_clip(w, h, n)
    fsz = w * h * 3 // 2
    out = []
    for i in range(n):
        b = np.frombuffer(raw[i * fsz : (i + 1) * fsz], np.uint8)
        out.append((b[: w * h].reshape(h, w),
                    b[w * h : w * h * 5 // 4].reshape(h // 2, w // 2),
                    b[w * h * 5 // 4 :].reshape(h // 2, w // 2)))
    return out


def test_rate_control_hits_target():
    clip = _clip(128, 64, 20)

    class R:
        def read_frame(self, i):
            return clip[i] if i < len(clip) else None

    achieved = {}
    for target in (200_000, 600_000):
        cfg = EncoderConfig(
            sps=SeqParams(width=128, height=64, max_tu_depth_intra=0),
            qp=32, intra_period=-1, fme_mode="none", inter_backend="np",
            target_bitrate=target, frame_rate=30)
        enc, _ = encode_sequence(R(), cfg, max_frames=20)
        assert all(f.md5_ok for f in decode_stream(enc.bitstream()))
        achieved[target] = sum(r.bits for r in enc.results) * 30 / 20
    for t, a in achieved.items():
        assert 0.75 * t < a < 1.35 * t, (t, a)
    # rates must scale with the target
    assert achieved[600_000] > achieved[200_000] * 2


def test_rate_model_update_direction():
    from tpuhevc.codec.ratectrl import RateControl

    rc = RateControl(400_000, 30, 128, 64, total_frames=30)
    qp1, lam1, tgt = rc.pick(1, False)
    rc.update(int(tgt * 4))  # massive overshoot
    qp2, lam2, _ = rc.pick(5, False)  # same gop position/level
    assert qp2 >= qp1  # model must push QP up after overshoot
