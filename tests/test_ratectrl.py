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


def test_rate_control_anchor_gop():
    """RC under the anchor coding structure (multi-ref LD-P GOP, not the
    old IPPP fallback): GOP-level bit allocation (TEncRCGOP counterpart)
    must still hit the target while the slice headers carry the anchor's
    multi-ref RPS."""
    clip = _clip(128, 64, 21)

    class R:
        def read_frame(self, i):
            return clip[i] if i < len(clip) else None

    target = 400_000
    cfg = EncoderConfig(
        sps=SeqParams(width=128, height=64, max_tu_depth_intra=0),
        qp=32, intra_period=-1, fme_mode="none", inter_backend="np",
        gop_qp_offsets=(5, 4, 5, 1), num_ref_frames=2,
        target_bitrate=target, frame_rate=30)
    enc, _ = encode_sequence(R(), cfg, max_frames=21)
    bs = enc.bitstream()
    frames = decode_stream(bs)
    assert len(frames) == 21 and all(f.md5_ok for f in frames)
    achieved = sum(r.bits for r in enc.results) * 30 / 21
    # +-5%: the shared-inter-model RC lands within ~2.5% on
    # non-saturated targets (VERDICT r04 ask; HM itself: -0.9%)
    assert 0.95 * target < achieved < 1.05 * target, achieved
    # the structure must really be multi-ref (anchor GOP), not IPPP
    from tpuhevc.entropy import bitio, headers
    sps = pps = None
    sps_rps = []
    n_refs = []
    for nal in bitio.read_annexb(bs):
        t = (nal[0] >> 1) & 0x3F
        rb = bitio.ebsp_to_rbsp(nal[2:])
        if t == bitio.NAL_SPS:
            sps, sps_rps = headers.parse_sps(rb)
        elif t == bitio.NAL_PPS:
            pps = headers.parse_pps(rb)
        elif t <= 31:
            hdr, _ = headers.parse_slice_header(rb, t, sps, pps, sps_rps)
            if hdr.slice_type != 2:  # not I
                n_refs.append(hdr.num_ref_idx_l0)
    assert max(n_refs) == 2, n_refs


def test_rate_model_update_direction():
    from tpuhevc.codec.ratectrl import RateControl

    rc = RateControl(400_000, 30, 128, 64, total_frames=30)
    qp1, lam1, tgt = rc.pick(1, False)
    rc.update(int(tgt * 4))  # massive overshoot
    qp2, lam2, _ = rc.pick(5, False)  # same gop position/level
    assert qp2 >= qp1  # model must push QP up after overshoot


def test_ctu_rate_control_cu_qp_delta(tmp_path):
    """CTU-level RC (LCULevelRC counterpart): per-CTU QPs signaled with
    cu_qp_delta, decoded hash-exact by us and the HM oracle; at least
    one frame must actually carry nonzero deltas."""
    import os
    import subprocess

    import numpy as np

    clip = _clip(192, 128, 12)

    class R:
        def read_frame(self, i):
            return clip[i] if i < len(clip) else None

    cfg = EncoderConfig(
        sps=SeqParams(width=192, height=128, max_tu_depth_intra=0),
        qp=32, intra_period=-1, fme_mode="none", inter_backend="np",
        target_bitrate=300_000, frame_rate=30, rc_ctu=True,
        deblocking=True)  # deblock must use the per-CTU QP map too
    enc, _ = encode_sequence(R(), cfg, max_frames=12)
    bs = enc.bitstream()
    frames = decode_stream(bs)
    assert len(frames) == 12
    assert all(f.md5_ok for f in frames)

    # the stream must really exercise per-CTU QP variation
    import tpuhevc.entropy.syntax as syn
    seen_qps = set()
    orig = syn._dec_dqp_if_pending

    def spy(dec, sc):
        pend = sc.dqp_pending
        orig(dec, sc)
        if pend and not sc.dqp_pending:
            seen_qps.add(sc.last_qp)
    syn._dec_dqp_if_pending = spy
    try:
        decode_stream(bs)
    finally:
        syn._dec_dqp_if_pending = orig
    assert len(seen_qps) > 1, f"expected varied CTU QPs, saw {seen_qps}"

    hm = "/tmp/hmref/TAppDecoder"
    if os.path.exists(hm):
        p = tmp_path / "rcctu.bin"
        p.write_bytes(bs)
        out = subprocess.run([hm, "-b", str(p)], capture_output=True,
                             text=True, timeout=120).stdout
        assert out.count("(OK)") == 12 and "ERROR" not in out


def test_adaptive_qp_preanalysis(tmp_path):
    """Source-activity adaptive QP (TEncPreanalyzer counterpart): smooth
    CTUs get lower QP than textured ones, the map rides cu_qp_delta,
    and both decoders replay it hash-exact."""
    import os
    import subprocess

    import numpy as np

    from tpuhevc.codec.preanalysis import adaptive_qp_map

    rng = np.random.default_rng(11)
    w, h, n = 192, 128, 6
    frames = []
    base_y = np.zeros((h, w), np.uint8)
    base_y[:, :96] = 100                     # flat half
    base_y[:, 96:] = rng.integers(0, 256, (h, 96))  # textured half
    for i in range(n):
        y = np.roll(base_y, i, axis=1)
        u = np.full((h // 2, w // 2), 128, np.uint8)
        v = np.full((h // 2, w // 2), 128, np.uint8)
        frames.append((y, u, v))

    m = adaptive_qp_map(frames[0][0], 32, 64, 6)
    assert m[:, 0].mean() < m[:, -1].mean()  # flat side gets lower QP

    class R:
        def read_frame(self, i):
            return frames[i] if i < len(frames) else None

    cfg = EncoderConfig(
        sps=SeqParams(width=w, height=h, max_tu_depth_intra=0),
        qp=32, intra_period=-1, fme_mode="none", inter_backend="np",
        adaptive_qp=True, deblocking=True)
    enc, _ = encode_sequence(R(), cfg, max_frames=n)
    bs = enc.bitstream()
    dec = decode_stream(bs)
    assert len(dec) == n and all(f.md5_ok for f in dec)
    hm = "/tmp/hmref/TAppDecoder"
    if os.path.exists(hm):
        p = tmp_path / "aq.bin"
        p.write_bytes(bs)
        out = subprocess.run([hm, "-b", str(p)], capture_output=True,
                             text=True, timeout=120).stdout
        assert out.count("(OK)") == n and "ERROR" not in out
