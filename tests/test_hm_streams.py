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


# --- HM-produced feature streams the decoder must accept (round-4:
# direction gap — tiles/WPP/WP/Main10 were only tested ours->HM) -------

REF_CFG_LDP10 = "/root/reference/cfg/encoder_lowdelay_P_main10.cfg"


@pytest.mark.oracle
def test_decode_hm_tiles(tmp_path):
    """HM tile streams (uniform 2x2 grid): per-tile CABAC restart +
    entry points / slice segmentation as HM writes them."""
    bs = _hm_encode(tmp_path, REF_CFG_LDP, frames=4, w=512, h=192,
                    extra=("--NumTileColumnsMinus1=1",
                           "--NumTileRowsMinus1=1",
                           "--UniformSpacingIdc=1",
                           "--LFCrossTileBoundaryFlag=1"))
    fr = decode_stream(bs)
    assert len(fr) == 4
    assert all(f.md5_ok for f in fr)


@pytest.mark.oracle
def test_decode_hm_wpp(tmp_path):
    """HM WPP streams (entropy_coding_sync): per-CTU-row substreams,
    context inheritance from the CTU above-right (TDecSlice.cpp:69)."""
    bs = _hm_encode(tmp_path, REF_CFG_LDP, frames=4, w=256, h=192,
                    extra=("--WaveFrontSynchro=1",))
    fr = decode_stream(bs)
    assert len(fr) == 4
    assert all(f.md5_ok for f in fr)


@pytest.mark.oracle
def test_decode_hm_weighted_pred(tmp_path):
    """HM explicit weighted prediction streams: pred_weight_table parse
    + weighted MC (WeightPredAnalysis picks real weights on a fading
    clip)."""
    from tools.make_test_clip import make_clip

    base = make_clip(192, 128, 6)
    fsz = 192 * 128 * 3 // 2
    fade = bytearray()
    for i in range(6):
        f = np.frombuffer(base[i * fsz : (i + 1) * fsz], np.uint8)
        fade += (f.astype(np.float32) * (1.0 - 0.12 * i)).astype(
            np.uint8).tobytes()
    # --FEN=0: HM's fast-encoder row-subsampled SAD asserts out with WP
    # (TComRdCostWeightPrediction.cpp:246 iSubShift==0) — encoder-side
    # HM bug, not a stream property
    bs = _hm_encode(tmp_path, REF_CFG_LDP, frames=6, raw=bytes(fade),
                    extra=("--WeightedPredP=1", "--FEN=0"))
    fr = decode_stream(bs)
    assert len(fr) == 6
    assert all(f.md5_ok for f in fr)


@pytest.mark.oracle
def test_decode_hm_main10(tmp_path):
    """HM Main10 streams (10-bit internal from 8-bit source)."""
    bs = _hm_encode(tmp_path, REF_CFG_LDP10, frames=4,
                    extra=("--InputBitDepth=8",))
    fr = decode_stream(bs)
    assert len(fr) == 4
    assert all(f.md5_ok for f in fr)


@pytest.mark.oracle
def test_encode_pcm_candidate(tmp_path):
    """Encoder-side I_PCM (TEncCu::xCheckIntraPCM counterpart): on a
    noise clip at very low QP the raw-sample candidate beats transform
    coding; the stream must carry PCM CUs and decode hash-OK in our
    decoder AND the HM reference decoder."""
    import subprocess

    from tpuhevc.codec.encoder import Encoder
    from tpuhevc.codec.params import EncoderConfig, SeqParams

    raw = _half_noise_clip(64, 64, 2)
    fsz = 64 * 64 * 3 // 2
    sps = SeqParams(width=64, height=64, max_tu_depth_intra=1,
                    pcm_enabled=True, pcm_log2_min=3, pcm_log2_max=5)
    cfg = EncoderConfig(sps=sps, qp=5, rdoq=True, inter_backend="np",
                        intra_period=1, intra_qt=True)
    cfg.pps.sign_data_hiding = True
    enc = Encoder(cfg)
    npcm = 0
    for i in range(2):
        f = np.frombuffer(raw[i * fsz : (i + 1) * fsz], np.uint8)
        y = f[: 64 * 64].reshape(64, 64)
        u = f[64 * 64 : 64 * 64 + 32 * 32].reshape(32, 32)
        v = f[64 * 64 + 32 * 32 :].reshape(32, 32)
        enc.encode_frame(y, u, v, poc=i)
    bs = enc.bitstream()
    fr, npcm = _count_pcm(bs)
    assert npcm > 0, "encoder never chose PCM; candidate is vacuous"
    assert all(f.md5_ok for f in fr)
    out = tmp_path / "pcm_enc.bin"
    out.write_bytes(bs)
    dec = "/tmp/hmref/TAppDecoder"
    if os.path.exists(dec):
        r = subprocess.run([dec, "-b", str(out), "-o", "/dev/null"],
                           capture_output=True)
        t = r.stdout.decode(errors="replace")
        assert r.returncode == 0 and t.count("(OK)") == 2 \
            and "ERROR" not in t, t


@pytest.mark.oracle
def test_decode_hm_scaling_list(tmp_path):
    """HM streams with ScalingList=1 (default lists): per-position
    dequant factors (§8.6.3 m[x][y], Table 7-5/7-6 defaults)."""
    bs = _hm_encode(tmp_path, REF_CFG_LDP, frames=4,
                    extra=("--ScalingList=1",))
    fr = decode_stream(bs)
    assert len(fr) == 4
    assert all(f.md5_ok for f in fr)


@pytest.mark.oracle
def test_encode_scaling_list(tmp_path):
    """Our encoder with default scaling lists: AI stream decodes hash-OK
    in our decoder AND the HM reference decoder."""
    import subprocess

    from tools.make_test_clip import make_clip
    from tpuhevc.codec.encoder import Encoder
    from tpuhevc.codec.params import EncoderConfig, SeqParams

    raw = make_clip(96, 64, 2)
    fsz = 96 * 64 * 3 // 2
    sps = SeqParams(width=96, height=64, max_tu_depth_intra=1,
                    scaling_list_enabled=True)
    cfg = EncoderConfig(sps=sps, qp=27, rdoq=True, inter_backend="np",
                        intra_period=1, intra_qt=True)
    cfg.pps.sign_data_hiding = True
    enc = Encoder(cfg)
    for i in range(2):
        f = np.frombuffer(raw[i * fsz : (i + 1) * fsz], np.uint8)
        y = f[: 96 * 64].reshape(64, 96)
        u = f[96 * 64 : 96 * 64 + 48 * 32].reshape(32, 48)
        v = f[96 * 64 + 48 * 32 :].reshape(32, 48)
        enc.encode_frame(y, u, v, poc=i)
    bs = enc.bitstream()
    fr = decode_stream(bs)
    assert all(f.md5_ok for f in fr)
    out = tmp_path / "sl.bin"
    out.write_bytes(bs)
    dec = "/tmp/hmref/TAppDecoder"
    if os.path.exists(dec):
        r = subprocess.run([dec, "-b", str(out), "-o", "/dev/null"],
                           capture_output=True)
        t = r.stdout.decode(errors="replace")
        assert r.returncode == 0 and t.count("(OK)") == 2 \
            and "ERROR" not in t, t
