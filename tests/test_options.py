"""Config-system tests: genuine HM-16.9 GOP rows, CRC picture hash."""

import numpy as np

from tpuhevc.config.options import build_config, parse_gop_entry
from tpuhevc.utils.yuv import plane_crc

# verbatim rows from the reference cfg/encoder_lowdelay_P_main.cfg:24-27
HM169_LDP_ROWS = [
    "P    1   3        0          0          0.4624   0            0  "
    "             0           4                4         -1 -5 -9 -13   "
    "    0",
    "P    2   2        0          0          0.4624   0            0  "
    "             0           4                4         -1 -2 -6 -10   "
    "    1      -1       5         1 1 1 0 1",
    "P    3   3        0          0          0.4624   0            0  "
    "             0           4                4         -1 -3 -7 -11   "
    "    1      -1       5         0 1 1 1 1",
    "P    4   1        0          0          0.578    0            0  "
    "             0           4                4         -1 -4 -8 -12   "
    "    1      -1       5         0 1 1 1 1",
]


def test_parse_hm169_gop_rows():
    es = [parse_gop_entry(r) for r in HM169_LDP_ROWS]
    assert [e.qp_offset for e in es] == [3, 2, 3, 1]
    assert all(e.cb_qp_offset == 0 and e.cr_qp_offset == 0 for e in es)
    assert [e.qp_factor for e in es] == [0.4624, 0.4624, 0.4624, 0.578]
    assert all(e.num_ref_pics_active == 4 for e in es)
    assert es[0].ref_pics == [-1, -5, -9, -13]
    assert es[1].ref_pics == [-1, -2, -6, -10]
    assert es[0].inter_rps_predict == 0
    assert es[1].inter_rps_predict == 1
    assert es[1].delta_rps == -1
    assert es[1].ref_idcs == [1, 1, 1, 0, 1]


def test_parse_legacy_gop_row():
    # old layout: QPfactor directly at column 3
    e = parse_gop_entry("B 4 1 0.442 0 0 0 1 1 -4")
    assert e.qp_offset == 1 and e.qp_factor == 0.442
    assert e.ref_pics == [-4] and e.num_ref_pics_active == 1


def test_build_config_hm169_rows():
    opts = {"QP": "32", "SourceWidth": "64", "SourceHeight": "64"}
    for i, row in enumerate(HM169_LDP_ROWS):
        opts[f"Frame{i + 1}"] = row
    cfg, io = build_config(opts)
    assert cfg.gop_qp_offsets == (3, 2, 3, 1)
    assert cfg.num_ref_frames == 4


def _crc_bitwise(data: bytes) -> int:
    """Direct transcription of compCRC (TComPicYuvMD5.cpp:89) incl. the
    16 trailing zero bits."""
    crc = 0xFFFF
    for byte in data + b"\x00\x00":
        for bit in range(8):
            msb = (crc >> 15) & 1
            crc = (((crc << 1) + ((byte >> (7 - bit)) & 1)) & 0xFFFF) ^ (
                msb * 0x1021)
    return crc


def test_plane_crc_matches_reference_algorithm():
    rng = np.random.default_rng(7)
    p = rng.integers(0, 256, size=(16, 24), dtype=np.int32)
    got = plane_crc(p, 8)
    want = _crc_bitwise(p.astype(np.uint8).tobytes())
    assert got == want.to_bytes(2, "big")


def test_crc_hash_roundtrip():
    import dataclasses

    from tpuhevc.codec.decoder import decode_stream
    from tpuhevc.codec.encoder import Encoder
    from tpuhevc.codec.params import EncoderConfig, SeqParams

    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (32, 32), np.int32)
    u = rng.integers(0, 256, (16, 16), np.int32)
    v = rng.integers(0, 256, (16, 16), np.int32)
    cfg = EncoderConfig(sps=SeqParams(width=32, height=32), qp=30,
                        intra_period=1, hash_type="crc")
    enc = Encoder(cfg)
    enc.encode_frame(y, u, v, poc=0)
    frames = decode_stream(enc.bitstream())
    assert frames and frames[0].md5_ok is True


def test_anchor_cfgs_fully_bound():
    """Every key in the reference's Main/Main10 anchor cfgs must be
    bound, accepted-at-default, or an intentional no-op — nothing
    silently unknown (the silent-conformance-change trap)."""
    import glob
    import os

    from tpuhevc.config.options import build_config, parse_cfg_file

    cfgs = glob.glob("/root/reference/cfg/encoder_*main.cfg") + glob.glob(
        "/root/reference/cfg/encoder_*main10.cfg")
    if not cfgs:
        import pytest

        pytest.skip("reference cfgs not mounted")
    for f in cfgs:
        cfg, io = build_config(parse_cfg_file(f))
        unk = set((io.get("unknown") or {}).keys())
        assert unk <= {"BitstreamFile", "ReconFile"}, (os.path.basename(f),
                                                       sorted(unk))


def test_nondefault_unsupported_raises():
    import pytest

    from tpuhevc.config.options import build_config

    with pytest.raises(NotImplementedError):
        build_config({"ScalingList": "2"})  # explicit lists unsupported
    cfg, _ = build_config({"ScalingList": "1"})  # default lists bind
    assert cfg.sps.scaling_list_enabled
    # PCMEnabledFlag binds since round 4 (encoder-side PCM candidate)
    cfg, _ = build_config({"PCMEnabledFlag": "1", "PCMLog2MaxSize": "5",
                           "PCMLog2MinSize": "3"})
    assert cfg.sps.pcm_enabled and cfg.sps.pcm_log2_max == 5
