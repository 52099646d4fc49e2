"""Fuzz roundtrip of residual_coding: coefficients -> bins -> coefficients,
with identical context evolution, across sizes, scans, components, and
level distributions (incl. big escape levels and sign hiding)."""

import numpy as np
import pytest

from tpuhevc.entropy import bitio
from tpuhevc.entropy.cabac import CabacDecoder, CabacEncoder, ContextSet
from tpuhevc.entropy.residual import decode_residual, encode_residual


def _roundtrip_blocks(blocks, sign_hiding=False):
    ctx_e = ContextSet(2, 32)
    enc = CabacEncoder(ctx_e)
    for coeffs, log2, is_luma, scan_idx in blocks:
        encode_residual(enc, coeffs, log2, is_luma, scan_idx, sign_hiding)
    enc.encode_bin_trm(1)
    enc.finish()
    w = bitio.BitWriter()
    w.write_bytes(bytes(enc.out))
    val, nbits = enc.pending_bits
    w.write(val, nbits)
    w.rbsp_trailing_bits()
    data = w.getvalue()

    ctx_d = ContextSet(2, 32)
    dec = CabacDecoder(data, ctx_d)
    for coeffs, log2, is_luma, scan_idx in blocks:
        got = decode_residual(dec, log2, is_luma, scan_idx, sign_hiding)
        if sign_hiding:
            assert (np.abs(got) == np.abs(coeffs)).all()
        else:
            assert (got == coeffs).all(), (log2, is_luma, scan_idx)
    assert dec.decode_bin_trm() == 1
    assert ctx_e.states == ctx_d.states


def _rand_block(rng, log2, density, magnitude):
    s = 1 << log2
    c = np.zeros((s, s), dtype=np.int32)
    n = max(1, int(density * s * s))
    pos = rng.choice(s * s, size=n, replace=False)
    vals = rng.integers(1, magnitude + 1, size=n) * rng.choice([-1, 1], size=n)
    c.reshape(-1)[pos] = vals
    return c


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("scan_idx", [0, 1, 2])
def test_roundtrip_sizes_scans(log2, scan_idx):
    if log2 > 3 and scan_idx != 0:
        pytest.skip("hor/ver scans only exist for 4x4/8x8")
    rng = np.random.default_rng(log2 * 10 + scan_idx)
    blocks = []
    for i in range(30):
        is_luma = bool(rng.integers(2))
        density = rng.choice([0.02, 0.1, 0.5, 1.0])
        mag = int(rng.choice([1, 2, 3, 5, 100, 30000]))
        blocks.append((_rand_block(rng, log2, density, mag), log2, is_luma, scan_idx))
    _roundtrip_blocks(blocks)


def test_single_dc_coeff():
    for log2 in (2, 3, 4, 5):
        s = 1 << log2
        c = np.zeros((s, s), dtype=np.int32)
        c[0, 0] = -7
        _roundtrip_blocks([(c, log2, True, 0)])


def test_single_corner_coeff():
    # last position at the far corner exercises max prefix + suffix
    for log2 in (2, 3, 4, 5):
        s = 1 << log2
        c = np.zeros((s, s), dtype=np.int32)
        c[s - 1, s - 1] = 1
        c[0, 0] = 25
        _roundtrip_blocks([(c, log2, False, 0)])


def test_mixed_stream_many_blocks():
    rng = np.random.default_rng(99)
    blocks = []
    for i in range(120):
        log2 = int(rng.choice([2, 3, 4, 5]))
        scan = int(rng.choice([0, 1, 2])) if log2 <= 3 else 0
        blocks.append(
            (_rand_block(rng, log2, float(rng.uniform(0.01, 1)), 8), log2,
             bool(rng.integers(2)), scan)
        )
    _roundtrip_blocks(blocks)


def test_sign_hiding_roundtrip_abs():
    rng = np.random.default_rng(5)
    blocks = []
    for i in range(40):
        log2 = int(rng.choice([2, 3, 4, 5]))
        blocks.append((_rand_block(rng, log2, 0.6, 6), log2, True, 0))
    _roundtrip_blocks(blocks, sign_hiding=True)


def test_sign_bit_hiding_roundtrip():
    """SBH: encoder parity post-pass makes every CG's hidden sign
    decodable; python coder round-trips bit-exactly."""
    import numpy as np

    from tpuhevc.entropy.cabac import CabacDecoder, CabacEncoder, ContextSet
    from tpuhevc.entropy.residual import (SBH_THRESHOLD, _Grid,
                                          apply_sign_bit_hiding,
                                          decode_residual, encode_residual)
    from tpuhevc.utils.tables import SCAN_DIAG

    rng = np.random.default_rng(9)
    for log2 in (2, 3, 4):
        s = 1 << log2
        for _ in range(8):
            blk = rng.integers(-6, 7, (s, s)).astype(np.int32)
            if not blk.any():
                blk[0, 0] = 1
            ideal = blk + rng.uniform(-0.49, 0.49, blk.shape)
            adj = apply_sign_bit_hiding(blk, log2, SCAN_DIAG, ideal)
            # parity invariant: every qualifying CG encodes its first sign
            g = _Grid(log2, SCAN_DIAG)
            svals = adj.reshape(-1)[g.scan]
            for cg in range(g.num_cgs):
                seg = svals[cg * 16 : (cg + 1) * 16]
                nz = np.nonzero(seg)[0]
                if len(nz) == 0:
                    continue
                if int(nz[-1]) - int(nz[0]) < SBH_THRESHOLD:
                    continue
                want = 1 if seg[int(nz[0])] < 0 else 0
                assert int(np.abs(seg).sum()) & 1 == want
            if not adj.any():
                continue
            from tpuhevc.entropy import bitio

            ctx = ContextSet(1, 30)
            enc = CabacEncoder(ctx)
            encode_residual(enc, adj, log2, True, SCAN_DIAG, True)
            enc.encode_bin_trm(1)  # slice-end flush (as encode_slice_data)
            enc.finish()
            w = bitio.BitWriter()
            w.write_bytes(bytes(enc.out))
            val, nbits = enc.pending_bits
            w.write(val, nbits)
            w.rbsp_trailing_bits()
            # slack for the decoder's bypass lookahead at raw-stream end
            # (real slices end with the terminate bin; this is test-only)
            dec = CabacDecoder(w.getvalue() + b"\x00\x00",
                               ContextSet(1, 30))
            got = decode_residual(dec, log2, True, SCAN_DIAG, True)
            assert np.array_equal(got, adj)
