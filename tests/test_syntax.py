"""Slice-data syntax roundtrip: random frames of CU decisions/modes/coeffs
serialize and parse back identically (incl. partial border CTUs)."""

import numpy as np

from tpuhevc.codec.params import PicParams, SeqParams
from tpuhevc.entropy import bitio
from tpuhevc.entropy.cabac import CabacDecoder, CabacEncoder, ContextSet
from tpuhevc.entropy.syntax import (
    FrameSyntax,
    decode_slice_data,
    encode_slice_data,
)


def _random_frame(rng, w, h, max_cu_log2=5, density=0.2):
    fs = FrameSyntax(w, h)
    # random CU tiling: walk 8x8 grid, place aligned CUs
    h8, w8 = h // 8, w // 8
    taken = np.zeros((h8, w8), dtype=bool)
    for y8 in range(h8):
        for x8 in range(w8):
            if taken[y8, x8]:
                continue
            for log2 in rng.permutation([3, 3, 3, 4, 4, 5]):
                s8 = 1 << (log2 - 3)
                if (
                    log2 <= max_cu_log2
                    and x8 % s8 == 0 and y8 % s8 == 0
                    and x8 + s8 <= w8 and y8 + s8 <= h8
                    and (x8 * 8) % 64 + 8 * s8 <= 64  # CU within CTU
                    and (y8 * 8) % 64 + 8 * s8 <= 64
                    and not taken[y8 : y8 + s8, x8 : x8 + s8].any()
                ):
                    break
            else:
                log2, s8 = 3, 1
            taken[y8 : y8 + s8, x8 : x8 + s8] = True
            fs.cu_log2[y8 : y8 + s8, x8 : x8 + s8] = log2
            fs.luma_mode[y8 : y8 + s8, x8 : x8 + s8] = rng.integers(0, 35)
            fs.chroma_mode[y8 : y8 + s8, x8 : x8 + s8] = 4
            s = 1 << log2
            x0, y0 = x8 * 8, y8 * 8
            if rng.random() < 0.9:
                blk = (rng.random((s, s)) < density) * rng.integers(
                    -40, 41, size=(s, s)
                )
                fs.coeff_y[y0 : y0 + s, x0 : x0 + s] = blk
            if rng.random() < 0.4:
                cs = s // 2
                fs.coeff_cb[y0 // 2 : y0 // 2 + cs, x0 // 2 : x0 // 2 + cs] = (
                    rng.random((cs, cs)) < density
                ) * rng.integers(-10, 11, size=(cs, cs))
            if rng.random() < 0.4:
                cs = s // 2
                fs.coeff_cr[y0 // 2 : y0 // 2 + cs, x0 // 2 : x0 // 2 + cs] = (
                    rng.random((cs, cs)) < density
                ) * rng.integers(-10, 11, size=(cs, cs))
    return fs


def _roundtrip(fs, sps, pps):
    ctx_e = ContextSet(2, 32)
    enc = CabacEncoder(ctx_e)
    encode_slice_data(enc, fs, sps, pps)
    enc.finish()
    w = bitio.BitWriter()
    w.write_bytes(bytes(enc.out))
    val, nbits = enc.pending_bits
    w.write(val, nbits)
    w.rbsp_trailing_bits()
    data = w.getvalue()

    ctx_d = ContextSet(2, 32)
    dec = CabacDecoder(data, ctx_d)
    got = decode_slice_data(dec, sps, pps, fs.width, fs.height)
    assert (got.cu_log2 == fs.cu_log2).all()
    assert (got.luma_mode == fs.luma_mode).all()
    assert (got.chroma_mode == fs.chroma_mode).all()
    assert (got.coeff_y == fs.coeff_y).all()
    assert (got.coeff_cb == fs.coeff_cb).all()
    assert (got.coeff_cr == fs.coeff_cr).all()
    assert ctx_e.states == ctx_d.states
    return len(data)


def test_roundtrip_aligned_picture():
    rng = np.random.default_rng(1)
    sps = SeqParams(width=128, height=64)
    fs = _random_frame(rng, 128, 64)
    _roundtrip(fs, sps, PicParams())


def test_roundtrip_partial_border_ctus():
    rng = np.random.default_rng(2)
    sps = SeqParams(width=416, height=240)  # 416 = 6.5 CTUs -> implicit splits
    fs = _random_frame(rng, 416, 240)
    _roundtrip(fs, sps, PicParams())


def test_roundtrip_all_8x8_high_density():
    rng = np.random.default_rng(3)
    sps = SeqParams(width=64, height=64)
    fs = _random_frame(rng, 64, 64, max_cu_log2=3, density=0.9)
    _roundtrip(fs, sps, PicParams())


def test_roundtrip_zero_frame():
    sps = SeqParams(width=64, height=64)
    fs = FrameSyntax(64, 64)
    _roundtrip(fs, sps, PicParams())


def test_roundtrip_tu_split_64():
    # a 64x64 CU must implicitly split its TU into four 32x32s
    rng = np.random.default_rng(4)
    sps = SeqParams(width=64, height=64, max_tu_depth_intra=1)
    fs = FrameSyntax(64, 64)
    fs.cu_log2[:] = 6
    fs.luma_mode[:] = 26
    fs.coeff_y[0:64, 0:64] = (rng.random((64, 64)) < 0.1) * rng.integers(
        -20, 21, size=(64, 64)
    )
    fs.coeff_cb[0:16, 0:16] = 3
    _roundtrip(fs, sps, PicParams())


def test_roundtrip_pcm():
    """I_PCM CUs mixed with regular intra CUs: pcm_flag terminating bin,
    one-shot CABAC flush + '1' + zero alignment, byte-aligned raw Y/Cb/Cr
    samples, engine restart (TEncSbac::codeIPCMInfo / parseIPCMInfo)."""
    rng = np.random.default_rng(11)
    sps = SeqParams(width=64, height=64)
    sps.pcm_enabled = True
    fs = _random_frame(rng, 64, 64)
    # overwrite the CUs covering two target cells with PCM; register each
    # block at the actual CU root (the random frame may put the target
    # cell inside a larger CU rooted elsewhere)
    for tx8, ty8 in ((0, 0), (4, 4)):
        log2 = int(fs.cu_log2[ty8, tx8])
        cpc = 1 << (log2 - 3)  # 8-cells per CU side
        x8, y8 = tx8 // cpc * cpc, ty8 // cpc * cpc  # CU root
        if not (sps.pcm_log2_min <= log2 <= sps.pcm_log2_max):
            # re-carve the whole containing CU into 16x16 CUs, then PCM
            # the aligned 16 that covers the target cell
            fs.cu_log2[y8 : y8 + cpc, x8 : x8 + cpc] = 4
            log2 = 4
            x8, y8 = tx8 // 2 * 2, ty8 // 2 * 2
        s = 1 << log2
        cs = s >> 1
        fs.coeff_y[y8 * 8 : y8 * 8 + s, x8 * 8 : x8 * 8 + s] = 0
        fs.coeff_cb[y8 * 4 : y8 * 4 + cs, x8 * 4 : x8 * 4 + cs] = 0
        fs.coeff_cr[y8 * 4 : y8 * 4 + cs, x8 * 4 : x8 * 4 + cs] = 0
        fs.pcm_blocks[(x8, y8)] = (
            rng.integers(0, 256, (s, s)),
            rng.integers(0, 256, (cs, cs)),
            rng.integers(0, 256, (cs, cs)),
        )
    ctx_e = ContextSet(2, 32)
    enc = CabacEncoder(ctx_e)
    encode_slice_data(enc, fs, sps, PicParams())
    enc.finish()
    w = bitio.BitWriter()
    w.write_bytes(bytes(enc.out))
    val, nbits = enc.pending_bits
    w.write(val, nbits)
    w.rbsp_trailing_bits()
    data = w.getvalue()

    dec = CabacDecoder(data, ContextSet(2, 32))
    got = decode_slice_data(dec, sps, PicParams(), 64, 64)
    assert set(got.pcm_blocks) == set(fs.pcm_blocks)
    for k, (gy, gu, gv) in got.pcm_blocks.items():
        ey, eu, ev = fs.pcm_blocks[k]
        assert (gy == ey).all() and (gu == eu).all() and (gv == ev).all()
    assert (got.coeff_y == fs.coeff_y).all()
