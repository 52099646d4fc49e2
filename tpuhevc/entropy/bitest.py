"""Vectorized CABAC fractional-bit estimation for RD decisions.

Counterpart of the reference's FAST_BIT_EST machinery (estBitsSbac /
TEncBinCABACCounter, TComCABACTables.cpp): HM drives every RD decision
with per-context fractional-bit tables instead of the arithmetic coder.
Here the same ENTROPY_BITS table (entropy/ctx_tables.py) is evaluated at
the *initial* context states of the slice's (type, QP) — context
adaptation is not tracked, which keeps every estimator a pure table
lookup that vectorizes over whole planes on the TPU. Decisions consume
these as float32 bits; recon math stays int32 (decisions may be
approximate, conformance never is).

Accuracy vs the real adaptive coder is regression-tested in
tests/test_bitest.py (see the tolerance there); this replaces the
2*bit_length+1 Golomb proxy that under-counted sparse-residual overhead
(no last-position, CG, or significance-map terms) and over-counted dense
blocks — the #1 driver of round-1's measured 3.1x bit gap.
"""

from __future__ import annotations

import numpy as np

from ..utils.tables import GROUP_IDX, SCAN_DIAG, SIG_CTX_MAP_4x4, scan_order
from .cabac import CTX_OFFSET, NUM_CTX, ContextSet
from .ctx_tables import ENTROPY_BITS

_B = ENTROPY_BITS.astype(np.float64) / 32768.0  # bits per (state ^ bin)

_SIG_IDX_CACHE: dict = {}  # (log2, is_luma) -> sig ctx index map


def _eg_bits(u: np.ndarray, k: int) -> np.ndarray:
    """Exp-Golomb order-k code length of u >= 0 (vectorized, float)."""
    q = np.floor(np.log2((u.astype(np.float64) / (1 << k)) + 1.0))
    return 2.0 * q + 1.0 + k


# Golomb-Rice + escape length as coded by _encode_remaining
# (entropy/residual.py:250, TComTrQuant xWriteCoefRemainExGolomb parity)
def _rice_bits(rem: np.ndarray, rice: np.ndarray) -> np.ndarray:
    rem = rem.astype(np.int64)
    small = rem < (3 << rice)
    len_small = (rem >> np.maximum(rice, 0)) + 1 + rice
    # escape: prefix (3) + unary length extension + suffix
    r2 = np.maximum(rem - (3 << rice), 0)
    ln = np.maximum(rice, 0).astype(np.int64)
    # find length: smallest L >= rice with sum_{k=rice}^{L-1} 2^k > r2 - ...
    # equivalently L from the escape loop; closed form via log2
    v = r2.astype(np.float64) / np.exp2(rice.astype(np.float64)) + 1.0
    ext = np.floor(np.log2(v)).astype(np.int64)
    length = ln + ext
    len_esc = (3 + (length - ln) + 1) + length
    return np.where(small, len_small, len_esc).astype(np.float64)


def _warm_states(ctx: ContextSet, init_row: int, qp: int) -> None:
    """Advance the context states from their init values to a typical
    steady state by coding a small deterministic synthetic corpus
    (quantized-Gaussian residual tiles + mixed mvds) through the exact
    adaptive counter. Init states alone overestimate steady-state costs
    (most visibly sparse significance maps); HM sidesteps this by loading
    live coder states into its estimator per CU (TEncCu RD snapshots) —
    a static warm snapshot is the table-only equivalent."""
    from ..ops import transforms as tx
    from .cabac import CabacBitEstimator
    from .residual import encode_residual
    from .syntax import _enc_mvd

    enc = CabacBitEstimator(ctx)
    rng = np.random.default_rng(12345)
    if init_row != 2:  # inter-slice statistics
        for _ in range(2):
            mvds = rng.integers(-24, 25, (24, 2))
            mvds[rng.random(24) < 0.5] = 0
            for d in mvds:
                _enc_mvd(enc, (int(d[0]), int(d[1])))
    amps = (4, 14) if init_row != 2 else (10, 25)
    for S, n in ((8, 12), (16, 8), (32, 4)):
        res = np.concatenate([
            np.clip(np.round(rng.normal(0, amp, (n, S, S))), -255,
                    255).astype(np.int32) for amp in amps])
        lvl = tx.quantize_np(tx.forward_transform_np(res, 8), qp,
                             S.bit_length() - 1, 8, False)
        for t in lvl:
            if t.any():
                encode_residual(enc, t, S.bit_length() - 1, True, SCAN_DIAG)
        # chroma at the same scale but sparser
        resc = np.clip(np.round(rng.normal(0, amps[0] * 0.6,
                                           (n // 2, S, S))),
                       -255, 255).astype(np.int32)
        lvlc = tx.quantize_np(tx.forward_transform_np(resc, 8), qp,
                              S.bit_length() - 1, 8, False)
        for t in lvlc:
            if t.any():
                encode_residual(enc, t, S.bit_length() - 1, False,
                                SCAN_DIAG)


class FracBits:
    """Per-(slice-type-row, QP) fractional-bit tables. bits[c, b] = bits
    to code bin value b in context c at its (warmed) initial state."""

    _cache: dict = {}

    def __new__(cls, init_row: int, qp: int):
        key = (init_row, qp)
        hit = cls._cache.get(key)
        if hit is not None:
            return hit
        self = super().__new__(cls)
        self._build(init_row, qp)
        cls._cache[key] = self
        return self

    @classmethod
    def from_states(cls, init_row: int, qp: int, states) -> "FracBits":
        """Tables evaluated at an EXPLICIT context-state vector (the
        end-of-slice snapshot fed back from the real coder, native v5
        ctx_out) instead of the warmed init states — HM's live
        estBitsSbac load (TEncSbac::load) adapted to the whole-frame
        batch design: chunk N decides with chunk N-1's adapted
        statistics. Not cached (each feedback vector is fresh)."""
        self = super().__new__(cls)
        self.init_row, self.qp = init_row, qp
        self.adaptive = True
        self._bind(np.asarray(states, dtype=np.int64))
        return self

    def _build(self, init_row: int, qp: int) -> None:
        self.init_row, self.qp = init_row, qp
        ctx = ContextSet(init_row, qp)
        _warm_states(ctx, init_row, qp)
        self._bind(np.asarray(ctx.states, dtype=np.int64))

    def _bind(self, states: np.ndarray) -> None:
        self.bin_bits = np.stack([_B[states ^ 0], _B[states ^ 1]], axis=1)
        # mvd component bits: abs_mvd_greater0/1 flags (ctx 0/1) + EG1 + sign
        g0, g1 = (self.bin_bits[CTX_OFFSET["abs_mvd_greater_flag"] + i]
                  for i in (0, 1))
        v = np.arange(4096)
        t = np.where(
            v == 0, g0[0],
            np.where(v == 1, g0[1] + g1[0] + 1.0,
                     g0[1] + g1[1] + _eg_bits(np.maximum(v - 2, 0), 1) + 1.0))
        self.mvd_lut = t.astype(np.float32)  # per |component|
        # merge_idx bits for idx 0..4 at max_merge = m
        mi = self.bin_bits[CTX_OFFSET["merge_idx"]]

        def merge_idx_bits(idx: int, max_merge: int) -> float:
            if max_merge <= 1:
                return 0.0
            if idx == 0:
                return float(mi[0])
            b = float(mi[1]) + (idx - 1)  # bypass unary ones
            if idx < max_merge - 1:
                b += 1.0  # terminating bypass zero
            return b

        self.merge_idx_bits = merge_idx_bits
        self.b = lambda name, i, v: float(
            self.bin_bits[CTX_OFFSET[name] + i, v])

    def ref_idx_bits(self, ref: int, num_ref: int) -> float:
        """ref_idx_lX binarization: first two bins ctx-coded, rest bypass."""
        if num_ref <= 1:
            return 0.0
        b = self.b("ref_idx", 0, 1 if ref > 0 else 0)
        if ref > 0 and num_ref > 2 or ref == 1 and num_ref == 2:
            pass
        if ref == 0:
            return b
        if num_ref > 2:
            b += self.b("ref_idx", 1, 1 if ref > 1 else 0)
        if ref > 1:
            b += max(0, ref - 2) + (1.0 if ref < num_ref - 1 else 0.0)
        return b

    def mvd_bits(self, mvd: np.ndarray) -> np.ndarray:
        """(..., 2) quarter-pel mvd -> (...) bits (both components)."""
        a = np.minimum(np.abs(mvd), 4095)
        return self.mvd_lut[a[..., 0]] + self.mvd_lut[a[..., 1]]


class ResidualBitEst:
    """Whole-plane residual-coding bit estimate for square TUs of one
    size, diagonal scan (the inter path's layout). Mirrors
    encode_residual (entropy/residual.py) term by term with init-state
    context costs; the in-CG gt1 context walk and rice adaptation are
    approximated (validated in tests/test_bitest.py)."""

    _cache: dict = {}

    def __new__(cls, fb: FracBits, log2: int, is_luma: bool):
        key = (fb.init_row, fb.qp, log2, is_luma)
        if getattr(fb, "adaptive", False):
            self = super().__new__(cls)
            self._build(fb, log2, is_luma)
            return self
        hit = cls._cache.get(key)
        if hit is not None:
            return hit
        self = super().__new__(cls)
        self._build(fb, log2, is_luma)
        cls._cache[key] = self
        return self

    COST_FIELDS = ("sig_bits", "csbf_bits", "gt1_bits", "gt1_bits0",
                   "gt2_bits", "gt2_bits0", "lastx_bits", "lasty_bits")

    def cost_arrays(self) -> dict:
        """The adaptive (state-dependent) cost tables as a flat dict —
        the pytree leaves a traced frame step takes as runtime inputs
        (geometry stays baked into the graph)."""
        return {k: getattr(self, k) for k in self.COST_FIELDS}

    def with_costs(self, arrs: dict) -> "EstView":
        """This estimator's geometry with live (possibly traced) cost
        tables."""
        return EstView(self, arrs)

    def _build(self, fb: FracBits, log2: int, is_luma: bool) -> None:
        S = 1 << log2
        self.S, self.log2, self.is_luma = S, log2, is_luma
        scan = scan_order(log2, SCAN_DIAG)  # scan pos -> raster
        sp = np.empty(S * S, np.int32)
        sp[scan] = np.arange(S * S, dtype=np.int32)
        self.scan_pos = sp.reshape(S, S)  # raster (y, x) -> scan pos
        self.scan = scan

        # last-position bits per (gx) incl. suffix, x and y banks
        off = (3 * (log2 - 2) + ((log2 - 1) >> 2)) if is_luma else 15
        shift = ((log2 + 1) >> 2) if is_luma else (log2 - 2)
        base = CTX_OFFSET["last_sig_xy"]
        cmax = (log2 << 1) - 1
        lx, ly = [], []
        for bank, out in ((0, lx), (30, ly)):
            for g in range(cmax + 1):
                b = sum(fb.bin_bits[base + bank + off + (k >> shift), 1]
                        for k in range(g))
                if g < cmax:
                    b += fb.bin_bits[base + bank + off + (g >> shift), 0]
                if g > 3:
                    b += (g - 2) >> 1  # bypass suffix
                out.append(b)
        self.lastx_bits = np.asarray(lx, np.float32)
        self.lasty_bits = np.asarray(ly, np.float32)
        # raster pos of each scan pos -> (x, y) for the last-pos gather
        self.scan_x = (scan % S).astype(np.int32)
        self.scan_y = (scan // S).astype(np.int32)
        self.group_idx = np.asarray(GROUP_IDX, np.int32)

        # sig ctx bit maps per prev_csbf pattern (0..3): (4, S, S, 2)
        m = _SIG_IDX_CACHE.get((log2, is_luma))
        if m is None:
            sig_base = CTX_OFFSET["sig_coeff_flag"] + (0 if is_luma else 28)
            m = np.zeros((4, S, S), np.int32)
            for p in range(4):
                for y in range(S):
                    for x in range(S):
                        m[p, y, x] = sig_base + _sig_ctx_np(
                            x, y, p, log2, is_luma)
            _SIG_IDX_CACHE[(log2, is_luma)] = m
        self.sig_bits = fb.bin_bits[m].astype(np.float32)  # (4, S, S, 2)

        cs = CTX_OFFSET["sig_cg_flag"] + (0 if is_luma else 2)
        self.csbf_bits = fb.bin_bits[cs : cs + 2].astype(np.float32)
        # gt1 at ctx set 0/2 (first/later CGs), c1=1; gt2 at same sets
        g1 = CTX_OFFSET["coeff_gt1"] + (0 if is_luma else 16)
        g2 = CTX_OFFSET["coeff_gt2"] + (0 if is_luma else 4)
        cset = 2 if is_luma else 0
        self.gt1_bits = fb.bin_bits[g1 + 4 * cset + 1].astype(np.float32)
        self.gt1_bits0 = fb.bin_bits[g1 + 1].astype(np.float32)  # CG0 set
        self.gt2_bits = fb.bin_bits[g2 + cset].astype(np.float32)
        self.gt2_bits0 = fb.bin_bits[g2].astype(np.float32)
        ncg = max(1, (S * S) >> 4)
        # CG scan index grid: raster CG (yc, xc) -> CG scan order index
        cgw = max(1, S >> 2)
        cgm = np.empty((cgw, cgw), np.int32)
        for cg in range(ncg):
            r = int(scan[cg * 16])
            cgm[(r // S) >> 2, (r % S) >> 2] = cg
        self.cg_scan = cgm
        self.cg_w = cgw

    def tu_bits(self, xp, tiles, sbh: bool = False):
        """tiles: (N, S, S) int levels -> (N,) float32 estimated bits.
        All-zero tiles return 0 (the cbf flag itself is the caller's)."""
        S = self.S
        N = tiles.shape[0]
        a = xp.abs(tiles)
        nz = a > 0
        sp = xp.asarray(self.scan_pos)[None]  # (1, S, S)
        last = xp.max(xp.where(nz, sp, -1), axis=(1, 2))  # (N,)
        has = last >= 0
        lastc = xp.maximum(last, 0)
        # last position bits
        lx = xp.asarray(self.scan_x)[lastc]
        ly = xp.asarray(self.scan_y)[lastc]
        gi = xp.asarray(self.group_idx)
        bits = (xp.asarray(self.lastx_bits)[gi[lx]]
                + xp.asarray(self.lasty_bits)[gi[ly]])

        # CG layout
        cgw = self.cg_w
        acg = a.reshape(N, cgw, 4, cgw, 4)
        csbf = (acg.sum((2, 4)) > 0)  # (N, cgw, cgw) raster CG grid
        cgs = xp.asarray(self.cg_scan)[None]  # CG scan index
        last_cg = lastc >> 4
        # csbf flags coded for 0 < cg_scan < last_cg
        csbf_coded = (cgs > 0) & (cgs < last_cg[:, None, None])
        # neighbor context: right/below csbf
        z = xp.zeros((N, cgw, 1), dtype=csbf.dtype)
        zr = xp.zeros((N, 1, cgw), dtype=csbf.dtype)
        right = xp.concatenate([csbf[:, :, 1:], z], axis=2)
        below = xp.concatenate([csbf[:, 1:, :], zr], axis=1)
        cbt = xp.asarray(self.csbf_bits)  # (2, 2)
        nb = (right | below).astype(xp.int32)
        bits = bits + xp.sum(
            xp.where(csbf_coded,
                     cbt[nb, csbf.astype(xp.int32)], 0.0), axis=(1, 2))

        # significance flags: coded positions in CGs that code sigs
        cg_sig_on = csbf | (cgs == 0) | (cgs == last_cg[:, None, None])
        cg_on_pix = xp.repeat(xp.repeat(cg_sig_on, 4, axis=1), 4, axis=2)
        coded = (sp < last[:, None, None]) & cg_on_pix
        prev = (right.astype(xp.int32)
                + 2 * below.astype(xp.int32))  # (N, cgw, cgw)
        prev_pix = xp.repeat(xp.repeat(prev, 4, axis=1), 4, axis=2)
        sigt = xp.asarray(self.sig_bits)  # (4, S, S, 2)
        yy = xp.arange(S)[None, :, None]
        xx = xp.arange(S)[None, None, :]
        sb = sigt[prev_pix, yy, xx, nz.astype(xp.int32)]
        bits = bits + xp.sum(xp.where(coded, sb, 0.0), axis=(1, 2))

        # per-CG level coding: gt1 (<=8 bins), gt2 (<=1), remainders, signs
        n_sig = nz.reshape(N, cgw, 4, cgw, 4).sum((2, 4))  # (N, cgw, cgw)
        n_gt1 = (a > 1).reshape(N, cgw, 4, cgw, 4).sum((2, 4))
        any_gt2 = (a > 2).reshape(N, cgw, 4, cgw, 4).any((2, 4))
        bins1 = xp.minimum(n_sig, 8)
        ones1 = xp.minimum(n_gt1, bins1)
        g1t = xp.asarray(self.gt1_bits)
        g1t0 = xp.asarray(self.gt1_bits0)
        is_cg0 = cgs == 0
        b1 = xp.where(is_cg0, g1t0[1], g1t[1]) * ones1 \
            + xp.where(is_cg0, g1t0[0], g1t[0]) * (bins1 - ones1)
        g2t = xp.asarray(self.gt2_bits)
        g2t0 = xp.asarray(self.gt2_bits0)
        b2 = xp.where(n_gt1 > 0,
                      xp.where(is_cg0,
                               xp.where(any_gt2, g2t0[1], g2t0[0]),
                               xp.where(any_gt2, g2t[1], g2t[0])), 0.0)
        bits = bits + xp.sum(b1 + b2, axis=(1, 2))

        # remainders: base 2 within the first-8 window (3 for the gt2
        # coeff, 1 beyond 8 — approximated by base 2, rice from the CG max)
        cg_max = a.reshape(N, cgw, 4, cgw, 4).max((2, 4))
        rice = xp.clip(
            xp.where(cg_max > 6, xp.log2(xp.maximum(cg_max, 1)
                                         .astype(xp.float32) / 3.0), 0.0),
            0, 4).astype(xp.int32)
        rice_pix = xp.repeat(xp.repeat(rice, 4, axis=1), 4, axis=2)
        rem = xp.maximum(a - 2, 0)
        rb = _rice_bits_xp(xp, rem, rice_pix)
        bits = bits + xp.sum(xp.where(rem > 0, rb, 0.0), axis=(1, 2))

        # signs (SBH hides one per qualifying CG)
        nsign = xp.sum(n_sig, axis=(1, 2)).astype(xp.float32)
        if sbh:
            # span test per CG: first/last nonzero in-CG scan distance >= 4
            inpos = sp % 16
            big = xp.where(nz, inpos, -1).reshape(N, cgw, 4, cgw, 4)
            small = xp.where(nz, inpos, 99).reshape(N, cgw, 4, cgw, 4)
            span = big.max((2, 4)) - small.min((2, 4))
            nsign = nsign - xp.sum((span >= 4) & (n_sig > 0),
                                   axis=(1, 2)).astype(xp.float32)
        bits = bits + nsign
        return xp.where(has, bits, 0.0).astype(xp.float32)


class EstView:
    """A ResidualBitEst's geometry bound to LIVE cost tables (possibly
    jax tracers): what the jitted frame step sees when the estimator
    tables are runtime inputs instead of baked constants."""

    def __init__(self, base: ResidualBitEst, arrs: dict):
        self._base = base
        for k in ResidualBitEst.COST_FIELDS:
            setattr(self, k, arrs[k])

    def __getattr__(self, k):  # geometry + methods fall through
        return getattr(self._base, k)

    def tu_bits(self, xp, tiles, sbh: bool = False):
        return ResidualBitEst.tu_bits(self, xp, tiles, sbh=sbh)


def _rice_bits_xp(xp, rem, rice):
    """xp twin of _rice_bits (int inputs, float32 out)."""
    rem = rem.astype(xp.int32)
    three = 3 << rice
    small = rem < three
    len_small = (rem >> rice) + 1 + rice
    r2 = xp.maximum(rem - three, 0)
    v = r2.astype(xp.float32) / xp.exp2(rice.astype(xp.float32)) + 1.0
    ext = xp.floor(xp.log2(v)).astype(xp.int32)
    len_esc = 4 + ext + rice + ext
    return xp.where(small, len_small, len_esc).astype(xp.float32)


def _sig_ctx_np(x: int, y: int, prev_csbf: int, log2: int,
                is_luma: bool) -> int:
    """Scalar mirror of residual._sig_ctx for diagonal scan."""
    if log2 == 2:
        return int(SIG_CTX_MAP_4x4[(y << 2) + x])
    if x == 0 and y == 0:
        return 0
    xp_, yp_ = x & 3, y & 3
    if prev_csbf == 0:
        s = 2 if xp_ + yp_ == 0 else (1 if xp_ + yp_ < 3 else 0)
    elif prev_csbf == 1:
        s = 2 if yp_ == 0 else (1 if yp_ == 1 else 0)
    elif prev_csbf == 2:
        s = 2 if xp_ == 0 else (1 if xp_ == 1 else 0)
    else:
        s = 2
    if is_luma:
        if (x >> 2) or (y >> 2):
            s += 3
        s += 9 if log2 == 3 else 21
    else:
        s += 9 if log2 == 3 else 12
    return s
