"""SEI framework: roundtrip of every emitted message + stream-level
presence and HM-oracle tolerance (SEIwrite/SEIread counterparts)."""

import os
import subprocess

import numpy as np
import pytest

from tpuhevc.entropy import bitio, sei


def test_sei_roundtrip_all_messages():
    msgs = [
        sei.ActiveParameterSets(sps_ids=[0, 1]),
        sei.RecoveryPoint(recovery_poc_cnt=3, exact_match=False),
        sei.PicTiming(pic_struct=0),
        sei.UserDataUnregistered(data=b"hello world"),
    ]
    nal = sei.write_sei_nal(msgs)
    out = sei.parse_sei_nal(nal)
    assert [t for t, _ in out] == [
        sei.SEI_ACTIVE_PARAMETER_SETS, sei.SEI_RECOVERY_POINT,
        sei.SEI_PIC_TIMING, sei.SEI_USER_DATA_UNREGISTERED]
    aps, rp, pt, ud = (m for _, m in out)
    assert aps.sps_ids == [0, 1]
    assert rp.recovery_poc_cnt == 3 and not rp.exact_match
    assert pt.pic_struct == 0 and pt.source_scan_type == 1
    assert ud.uuid == sei.TPUHEVC_UUID and ud.data == b"hello world"


def test_sei_in_stream_and_hm(tmp_path):
    from tpuhevc.codec.decoder import decode_stream
    from tpuhevc.codec.encoder import encode_sequence
    from tpuhevc.codec.params import EncoderConfig, SeqParams

    rng = np.random.default_rng(5)
    w, h, n = 128, 64, 6
    frames = [tuple(rng.integers(0, 256, s, dtype=np.uint8) for s in
                    ((h, w), (h // 2, w // 2), (h // 2, w // 2)))
              for _ in range(n)]

    class R:
        def read_frame(self, i):
            return frames[i] if i < len(frames) else None

    cfg = EncoderConfig(
        sps=SeqParams(width=w, height=h, max_tu_depth_intra=0,
                      vui_timing=True, time_scale=30),
        qp=32, intra_period=4, fme_mode="none", inter_backend="np")
    enc, _ = encode_sequence(R(), cfg, max_frames=n)
    bs = enc.bitstream()
    dec = decode_stream(bs)
    assert len(dec) == n and all(f.md5_ok for f in dec)

    # collect prefix SEI messages across the stream
    seen = []
    for nal in bitio.read_annexb(bs):
        if ((nal[0] >> 1) & 0x3F) == bitio.NAL_PREFIX_SEI:
            seen += [t for t, _ in sei.parse_sei_nal(
                bitio.ebsp_to_rbsp(nal[2:]))]
    assert sei.SEI_ACTIVE_PARAMETER_SETS in seen
    assert sei.SEI_USER_DATA_UNREGISTERED in seen
    assert seen.count(sei.SEI_PIC_TIMING) == n     # one per AU
    assert sei.SEI_RECOVERY_POINT in seen          # the mid-stream IDR

    hm = "/tmp/hmref/TAppDecoder"
    if os.path.exists(hm):
        p = tmp_path / "sei.bin"
        p.write_bytes(bs)
        out = subprocess.run([hm, "-b", str(p)], capture_output=True,
                             text=True, timeout=120).stdout
        assert out.count("(OK)") == n and "ERROR" not in out


def test_hrd_buffering_period_pic_timing(tmp_path):
    """HRD breadth (SEIwrite.cpp xWriteSEIBufferingPeriod /
    xWriteSEIPicTiming + E.2.2 hrd_parameters): an all-intra encode with
    SEIBufferingPeriod on carries the VUI HRD, a buffering period on the
    IRAP, and per-AU CPB/DPB delays; our parser round-trips them and the
    HM oracle still hash-verifies the stream."""
    import os
    import subprocess

    import numpy as np

    from tpuhevc.codec.encoder import encode_sequence
    from tpuhevc.codec.params import EncoderConfig, SeqParams
    from tpuhevc.entropy import bitio, headers, sei

    rng = np.random.default_rng(3)
    w, h, n = 64, 64, 3
    frames = [tuple(rng.integers(0, 256, s, dtype=np.uint8).astype(np.int32)
                    for s in ((h, w), (h // 2, w // 2), (h // 2, w // 2)))
              for _ in range(n)]

    class R:
        def read_frame(self, i):
            return frames[i] if i < n else None

    cfg = EncoderConfig(sps=SeqParams(width=w, height=h,
                                      max_tu_depth_intra=0),
                        qp=32, intra_period=1, target_bitrate=0)
    cfg.sps.hrd_enabled = True
    cfg.sps.vui_timing = True
    enc, _ = encode_sequence(R(), cfg, max_frames=n)
    bs = enc.bitstream()

    seen = {"bp": 0, "pt": 0, "hrd_sps": 0}
    for nal in bitio.read_annexb(bs):
        t = (nal[0] >> 1) & 0x3F
        rb = bitio.ebsp_to_rbsp(nal[2:])
        if t == 33:  # SPS
            sps2, _ = headers.parse_sps(rb)
            assert sps2.hrd_enabled and sps2.hrd_bitrate > 0
            seen["hrd_sps"] += 1
        elif t == 39:  # prefix SEI
            for pt, m in sei.parse_sei_nal(rb):
                if isinstance(m, sei.BufferingPeriod):
                    seen["bp"] += 1
                    assert m.initial_cpb_removal_delay == 90000
                if isinstance(m, sei.PicTiming) and m.with_hrd:
                    seen["pt"] += 1
    assert seen["hrd_sps"] == 1
    assert seen["bp"] == n  # all-intra: every AU is an IRAP
    assert seen["pt"] == n

    hm = "/tmp/hmref/TAppDecoder"
    if os.path.exists(hm):
        p = tmp_path / "hrd.bin"
        p.write_bytes(bs)
        out = subprocess.run([hm, "-b", str(p)], capture_output=True,
                             text=True, timeout=120).stdout
        assert out.count("(OK)") == n and "ERROR" not in out
