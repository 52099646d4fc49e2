"""Calibration tests: the vectorized init-state bit estimator
(entropy/bitest.py) vs the exact adaptive counting coder
(CabacBitEstimator) on realistic residual data."""

import numpy as np
import pytest

from tpuhevc.entropy.bitest import FracBits, ResidualBitEst
from tpuhevc.entropy.cabac import CabacBitEstimator, ContextSet
from tpuhevc.entropy.residual import encode_residual
from tpuhevc.entropy.syntax import _enc_mvd
from tpuhevc.ops import transforms as tx
from tpuhevc.utils.tables import SCAN_DIAG


def _residual_tiles(S, qp, seed=0, n=64, kind="inter"):
    """Quantized DCT levels of synthetic prediction residuals."""
    rng = np.random.default_rng(seed)
    if kind == "inter":  # small-amplitude grain + occasional structure
        res = rng.normal(0, 4, (n, S, S))
        res[: n // 4] += rng.normal(0, 14, (n // 4, S, S))
    else:
        res = rng.normal(0, 18, (n, S, S))
    res = np.clip(np.round(res), -255, 255).astype(np.int32)
    log2 = S.bit_length() - 1
    coef = tx.forward_transform_np(res, 8)
    return tx.quantize_np(coef, qp, log2, 8, False)


def _real_bits(tiles, log2, is_luma=True, qp=32, warm=None):
    """Adaptive-coder bits per tile; `warm` tiles are coded first so the
    measurement reflects mid-stream (steady-state) statistics, as in a
    real slice."""
    ctx = ContextSet(1, qp)
    enc = CabacBitEstimator(ctx)
    if warm is not None:
        for t in warm:
            if t.any():
                encode_residual(enc, t, log2, is_luma, SCAN_DIAG)
    per = []
    for t in tiles:
        b0 = enc.frac_bits
        if t.any():
            encode_residual(enc, t, log2, is_luma, SCAN_DIAG)
        per.append((enc.frac_bits - b0) / 32768.0)
    return np.asarray(per)


@pytest.mark.parametrize("S", [8, 16, 32])
@pytest.mark.parametrize("qp", [22, 32, 37])
def test_residual_bits_accuracy(S, qp):
    tiles = _residual_tiles(S, qp, seed=S + qp)
    nz = tiles.reshape(len(tiles), -1).any(axis=1)
    if not nz.any():
        pytest.skip("all-zero at this QP")
    fb = FracBits(1, qp)
    est = ResidualBitEst(fb, S.bit_length() - 1, True)
    got = est.tu_bits(np, tiles)
    warm = _residual_tiles(S, qp, seed=99 - S, n=32)
    real = _real_bits(tiles, S.bit_length() - 1, qp=qp, warm=warm)
    assert np.all(got[~nz] == 0)
    tot_real, tot_got = real.sum(), got.sum()
    # aggregate accuracy: sparse regimes (QP >= 27, the anchor's working
    # range) must track the adaptive coder closely; dense (QP22) content
    # keeps a known overestimate from per-tile context adaptation that a
    # static table cannot model (Jensen gap) — bounded, not eliminated
    ratio = tot_got / tot_real
    if qp >= 27 and tot_real > 500:
        assert 0.85 < ratio < 1.15, ratio
    else:
        assert 0.7 < ratio < 1.5, ratio
    # per-tile monotonicity: ranking must broadly agree
    c = np.corrcoef(got[nz], real[nz])[0, 1]
    assert c > 0.95, c


def test_residual_bits_sparse_overhead():
    """A single level-1 coefficient must cost ~10+ bits (last pos + sig
    map + sign), which the old 2*bl+1 proxy called 3 bits."""
    qp = 32
    fb = FracBits(1, qp)
    est = ResidualBitEst(fb, 4, True)
    t = np.zeros((1, 16, 16), np.int32)
    t[0, 3, 2] = 1
    got = float(est.tu_bits(np, t)[0])
    real = float(_real_bits(t, 4, qp=qp)[0])
    assert abs(got - real) / real < 0.3
    assert got > 6.0


@pytest.mark.parametrize("qp", [22, 37])
def test_mvd_bits_accuracy(qp):
    rng = np.random.default_rng(3)
    mvds = rng.integers(-80, 81, (200, 2)).astype(np.int32)
    mvds[:50] = 0
    mvds[50:90, 0] = 0
    fb = FracBits(1, qp)
    got = fb.mvd_bits(mvds).sum()
    ctx = ContextSet(1, qp)
    enc = CabacBitEstimator(ctx)
    for d in mvds[:60]:  # warm-up span
        _enc_mvd(enc, (int(d[0]), int(d[1])))
    b0 = enc.bits
    for d in mvds:
        _enc_mvd(enc, (int(d[0]), int(d[1])))
    real = enc.bits - b0
    assert abs(got - real) / real < 0.15, (got, real)


def test_jnp_matches_np():
    import jax.numpy as jnp

    qp = 32
    tiles = _residual_tiles(16, qp, seed=1, n=16)
    fb = FracBits(1, qp)
    est = ResidualBitEst(fb, 4, True)
    a = est.tu_bits(np, tiles)
    b = np.asarray(est.tu_bits(jnp, jnp.asarray(tiles)))
    assert np.allclose(a, b, atol=1e-3)
