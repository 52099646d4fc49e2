"""End-to-end LD-P: encode (IDR + P frames, NN-FME / integer-only) ->
own decoder MD5 -> HM reference oracle. Also ME/MV unit checks."""

import os
import subprocess

import numpy as np
import pytest

from tpuhevc.codec.decoder import decode_stream
from tpuhevc.codec.encoder import Encoder
from tpuhevc.codec.params import EncoderConfig, SeqParams

HM_DEC = "/tmp/hmref/TAppDecoder"
HAS_REF_WEIGHTS = os.path.isdir("/root/reference/DL/blowing")


def _moving_clip(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0 : h + 64, 0 : w + 64].astype(np.float32)
    base = np.clip(
        120 + 70 * np.sin(xx / 19.0) + 50 * np.cos(yy / 23.0)
        + rng.integers(-8, 9, yy.shape), 0, 255,
    ).astype(np.uint8)
    frames = []
    for t in range(n):
        dx, dy = (3 * t) % 32, (2 * t) % 32
        y = base[dy : dy + h, dx : dx + w]
        u = np.full((h // 2, w // 2), 90 + 2 * t, np.uint8)
        v = np.full((h // 2, w // 2), 160 - 2 * t, np.uint8)
        frames.append((y, u, v))
    return frames


def _encode_ldp(w, h, n, qp=32, fme="none"):
    cfg = EncoderConfig(
        sps=SeqParams(width=w, height=h, max_tu_depth_intra=0),
        qp=qp, intra_period=-1, fme_mode=fme,
    )
    enc = Encoder(cfg)
    for i, fr in enumerate(_moving_clip(w, h, n)):
        enc.encode_frame(*fr, poc=i)
    return enc


def _check(enc, tmp_path):
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
        assert out.returncode == 0, out.stderr
        assert out.stdout.count("(OK)") == len(frames)
        assert "ERROR" not in out.stdout
    return frames


def test_ldp_integer_me(tmp_path):
    enc = _encode_ldp(128, 64, 4, fme="none")
    _check(enc, tmp_path)
    # pure-translation clip: P frames mostly skip, cheaper than the IDR,
    # and carry the intra frame's quality forward through MC
    assert enc.results[1].bits < enc.results[0].bits
    assert enc.results[1].psnr_y > enc.results[0].psnr_y - 0.5


@pytest.mark.skipif(not HAS_REF_WEIGHTS, reason="reference weights absent")
def test_ldp_nn_fme(tmp_path):
    enc = _encode_ldp(128, 64, 4, qp=32, fme="nn")
    frames = _check(enc, tmp_path)
    # subpel MVs must actually occur (NN output used)
    assert len(frames) == 4


def test_ldp_partial_border(tmp_path):
    enc = _encode_ldp(104, 72, 3, fme="none")
    _check(enc, tmp_path)


@pytest.mark.skipif(not HAS_REF_WEIGHTS, reason="reference weights absent")
def test_nn_vs_integer_ab(tmp_path):
    """A/B: same clip, fme=nn vs fme=none — both conformant; report RD."""
    e_nn = _encode_ldp(128, 64, 5, fme="nn")
    e_no = _encode_ldp(128, 64, 5, fme="none")
    _check(e_nn, tmp_path)
    _check(e_no, tmp_path)
    bits_nn = sum(r.bits for r in e_nn.results[1:])
    bits_no = sum(r.bits for r in e_no.results[1:])
    psnr_nn = np.mean([r.psnr_y for r in e_nn.results[1:]])
    psnr_no = np.mean([r.psnr_y for r in e_no.results[1:]])
    # the clip has integer motion; NN must not catastrophically lose
    assert bits_nn < bits_no * 1.5
    assert psnr_nn > psnr_no - 1.0


def test_me_finds_translation():
    from tpuhevc.ops import me as me_ops

    rng = np.random.default_rng(3)
    ref = rng.integers(0, 256, (96, 96)).astype(np.int32)
    # current = ref shifted by (5, -3)
    cur_plane = np.roll(np.roll(ref, -5, axis=1), 3, axis=0)
    xs = np.array([32, 48])
    ys = np.array([32, 48])
    cur = np.stack([cur_plane[y : y + 16, x : x + 16] for x, y in zip(xs, ys)])
    mv, sad_map, best = me_ops.integer_me_np(ref, cur, xs, ys, 8, 0)
    assert (mv == [5, -3]).all()
    s9 = me_ops.sad_surface_np(sad_map, best)
    assert (s9[:, 4] == 0).all()  # center SAD exactly zero


def test_me_jax_matches_np():
    import jax.numpy as jnp

    from tpuhevc.ops import me as me_ops

    rng = np.random.default_rng(4)
    ref = rng.integers(0, 256, (64, 80)).astype(np.int32)
    cur = rng.integers(0, 256, (6, 8, 8)).astype(np.int32)
    xs = rng.integers(0, 70, 6)
    ys = rng.integers(0, 50, 6)
    mv_np, sad_map, best = me_ops.integer_me_np(ref, cur, xs, ys, 6, 77)
    s9_np = me_ops.sad_surface_np(sad_map, best)
    mv_j, s9_j = me_ops.integer_me(
        jnp.asarray(ref), jnp.asarray(cur), jnp.asarray(xs), jnp.asarray(ys),
        6, 77)
    assert (np.asarray(mv_j) == mv_np).all()
    assert (np.asarray(s9_j) == s9_np).all()


def test_ra_hierarchical_b(tmp_path):
    """Random-access GOP4 with B slices: bi-pred conformance via
    self-decode + HM oracle."""
    import os
    import subprocess

    from tpuhevc.codec.decoder import decode_stream
    from tpuhevc.codec.encoder import encode_sequence
    from tpuhevc.codec.params import EncoderConfig, SeqParams

    clip = _moving_clip(128, 64, 9)
    cfg = EncoderConfig(
        sps=SeqParams(width=128, height=64, max_tu_depth_intra=0),
        qp=30, intra_period=-1, fme_mode="none", inter_backend="np",
        gop_structure="ra")

    class R:
        def read_frame(self, i):
            return clip[i] if i < len(clip) else None

    enc, _ = encode_sequence(R(), cfg, max_frames=9)
    bs = enc.bitstream()
    frames = decode_stream(bs)
    assert [f.poc for f in frames] == [0, 4, 2, 1, 3, 8, 6, 5, 7]
    assert all(f.md5_ok for f in frames)
    if os.path.exists(HM_DEC):
        p = tmp_path / "ra.bin"
        p.write_bytes(bs)
        out = subprocess.run([HM_DEC, "-b", str(p)], capture_output=True,
                             text=True, timeout=120).stdout
        assert out.count("(OK)") == 9 and "ERROR" not in out
        assert "B-SLICE" in out


def test_wpp_substreams(tmp_path):
    """Wavefront parallel processing: per-CTU-row substreams with context
    inheritance + entry points; HM-oracle verified."""
    import os
    import subprocess

    from tpuhevc.codec.decoder import decode_stream
    from tpuhevc.codec.encoder import encode_sequence
    from tpuhevc.codec.params import EncoderConfig, PicParams, SeqParams

    clip = _moving_clip(256, 128, 4)
    cfg = EncoderConfig(
        sps=SeqParams(width=256, height=128, max_tu_depth_intra=0),
        pps=PicParams(entropy_coding_sync=True),
        qp=30, intra_period=-1, fme_mode="none", inter_backend="np")

    class R:
        def read_frame(self, i):
            return clip[i] if i < len(clip) else None

    enc, _ = encode_sequence(R(), cfg, max_frames=4)
    bs = enc.bitstream()
    assert all(f.md5_ok for f in decode_stream(bs))
    if os.path.exists(HM_DEC):
        p = tmp_path / "wpp.bin"
        p.write_bytes(bs)
        out = subprocess.run([HM_DEC, "-b", str(p)], capture_output=True,
                             text=True, timeout=120).stdout
        assert out.count("(OK)") == 4 and "ERROR" not in out


def test_intra_in_p_slices(tmp_path):
    """Intra 8x8 fallback CUs inside P slices: conformant both in our
    decoder and the HM oracle; engages on scene-change content."""
    import os
    import subprocess

    import numpy as np

    from tools.make_test_clip import make_clip
    from tpuhevc.codec.decoder import decode_stream
    from tpuhevc.codec.encoder import encode_sequence
    from tpuhevc.codec.params import EncoderConfig, SeqParams

    w, h, n = 128, 64, 4
    clip = []
    for i in range(n):
        b = np.frombuffer(make_clip(w, h, 1, seed=5), np.uint8)
        y = b[: w * h].reshape(h, w).copy()
        if i % 2 == 1:
            y = 255 - y  # hard scene flip
        clip.append((y, b[w * h : w * h * 5 // 4].reshape(h // 2, w // 2)
                     .copy(),
                     b[w * h * 5 // 4 :].reshape(h // 2, w // 2).copy()))

    class R:
        def read_frame(self, i):
            return clip[i] if i < len(clip) else None

    cfg = EncoderConfig(
        sps=SeqParams(width=w, height=h, max_tu_depth_intra=0),
        qp=30, intra_period=-1, fme_mode="none", inter_backend="np",
        intra_in_inter=True)
    enc, _ = encode_sequence(R(), cfg, max_frames=n)
    bs = enc.bitstream()
    assert all(f.md5_ok for f in decode_stream(bs))
    if os.path.exists(HM_DEC):
        p = tmp_path / "iip.bin"
        p.write_bytes(bs)
        out = subprocess.run([HM_DEC, "-b", str(p)], capture_output=True,
                             text=True, timeout=120).stdout
        assert out.count("(OK)") == n and "ERROR" not in out


def test_checkpoint_resume(tmp_path):
    """Interrupt-and-resume produces a bitstream identical to the
    uninterrupted run (encoder state = POC + DPB recon + accumulated
    NALs; SURVEY.md §5 checkpoint/resume)."""
    from tpuhevc.codec.encoder import Encoder
    from tpuhevc.codec.params import EncoderConfig, SeqParams

    clip = _moving_clip(128, 64, 8)

    def cfg():
        return EncoderConfig(
            sps=SeqParams(width=128, height=64, max_tu_depth_intra=0),
            qp=32, intra_period=-1, fme_mode="none", inter_backend="np")

    ref = Encoder(cfg())
    for i in range(8):
        ref.encode_frame(*clip[i], poc=i)
    golden = ref.bitstream()

    a = Encoder(cfg())
    for i in range(4):
        a.encode_frame(*clip[i], poc=i)
    ck = tmp_path / "enc.ckpt"
    a.save_checkpoint(str(ck))
    b = Encoder(cfg())
    poc = b.load_checkpoint(str(ck))
    assert poc == 4
    for i in range(poc, 8):
        b.encode_frame(*clip[i], poc=i)
    assert b.bitstream() == golden


def test_gop_table_driven_ra_8deep(tmp_path):
    """GOP-table-driven hierarchical structure: the reference's 8-deep
    encoder_randomaccess_main GOP table drives slice types, decode
    order, QP offsets, and RPS (TEncGOP.cpp:1077 counterpart); our
    decoder and the HM oracle replay it hash-exact."""
    import os
    import subprocess

    from tpuhevc.codec.decoder import decode_stream
    from tpuhevc.codec.encoder import encode_sequence
    from tpuhevc.codec.params import EncoderConfig, SeqParams
    from tpuhevc.config.options import parse_gop_entry

    rows = [  # HM-16.9 cfg/encoder_randomaccess_main.cfg:24-31
        "B 8 1 0 0 0.442  0 0 0 2 3 -8 -12 -16 0",
        "B 4 2 0 0 0.3536 0 0 1 2 3 -4 -8 4 1",
        "B 2 3 0 0 0.3536 0 0 2 2 4 -2 -6 2 6 1",
        "B 1 4 0 0 0.68   0 0 3 2 4 -1 1 3 7 1",
        "B 3 4 0 0 0.68   0 0 3 2 4 -1 -3 1 5 1",
        "B 6 3 0 0 0.3536 0 0 2 2 3 -2 -6 2 1",
        "B 5 4 0 0 0.68   0 0 3 2 4 -1 -5 1 3 1",
        "B 7 4 0 0 0.68   0 0 3 2 4 -1 -3 -7 1 1",
    ]
    table = tuple(parse_gop_entry(r) for r in rows)
    clip = _moving_clip(128, 64, 17)
    cfg = EncoderConfig(
        sps=SeqParams(width=128, height=64, max_tu_depth_intra=0),
        qp=30, intra_period=-1, fme_mode="none", inter_backend="np",
        gop_structure="ra", gop_table=table)

    class R:
        def read_frame(self, i):
            return clip[i] if i < len(clip) else None

    enc, _ = encode_sequence(R(), cfg, max_frames=17)
    bs = enc.bitstream()
    frames = decode_stream(bs)
    assert len(frames) == 17
    # decode order follows the table rows per GOP
    assert [f.poc for f in frames][:9] == [0, 8, 4, 2, 1, 3, 6, 5, 7]
    assert all(f.md5_ok for f in frames)
    if os.path.exists(HM_DEC):
        p = tmp_path / "ra8.bin"
        p.write_bytes(bs)
        out = subprocess.run([HM_DEC, "-b", str(p)], capture_output=True,
                             text=True, timeout=120).stdout
        assert out.count("(OK)") == 17 and "ERROR" not in out
