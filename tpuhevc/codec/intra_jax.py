"""Batched JAX intra frame encoder: one jit per resolution.

TPU-first restructuring of the closed-loop intra encode (codec/recon.py is
the host reference): the whole frame is ONE compiled program — a lax.scan
over dependency-DAG wavefronts of 8x8 cells. Each step processes a batch of
independent cells: gather references from the carried recon planes, 35-mode
prediction + SATD + MPM-aware mode bits (integer cost), DCT/quant/dequant/
inverse, scatter recon + coefficients. Geometry (wave schedule, gather
indices, availability flags) is precomputed host-side per resolution.

Produces bit-identical decisions/coefficients/recon to the host path (see
test_intra_jax), so the serialized stream stays HM-conformant.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from ..ops import transforms as tx
from ..ops.cost import hadamard
from ..ops.intra import predict_all_modes
from ..utils.tables import chroma_qp, qp_to_lambda
from .params import EncoderConfig
from .refsamples import BlockOrder

_PAD = 1  # planes carry one trailing dummy slot for masked scatters


@dataclass(frozen=True)
class _Geometry:
    """Static per-resolution schedule + gather indices (numpy, host)."""

    steps: int
    bmax: int
    mask: np.ndarray          # (S, B) bool
    cell_idx: np.ndarray      # (S, B) flat index into (H8*W8) mode map
    avail: np.ndarray         # (S, B, 5) [lb, l, c, t, tr]
    mpm_left_idx: np.ndarray  # (S, B) flat mode-map index (clamped)
    mpm_left_ok: np.ndarray   # (S, B)
    mpm_above_idx: np.ndarray
    mpm_above_ok: np.ndarray
    y_seg: np.ndarray         # (S, B, 33) luma ref sample flat idx
    y_blk: np.ndarray         # (S, B, 64) luma block flat idx
    c_seg: np.ndarray         # (S, B, 17) chroma ref flat idx (half-res plane)
    c_blk: np.ndarray         # (S, B, 16)


def _compute_waves(w8: int, h8: int, order: BlockOrder) -> list[list[tuple[int, int]]]:
    wave = np.zeros((h8, w8), dtype=np.int64)
    cells = sorted(
        ((x, y) for y in range(h8) for x in range(w8)),
        key=lambda c: order.order[c[1], c[0]],
    )
    for x, y in cells:
        m = 0
        for dx, dy in ((-1, 0), (0, -1), (1, -1), (-1, 1)):
            nx, ny = x + dx, y + dy
            if 0 <= nx < w8 and 0 <= ny < h8 and order.order[ny, nx] < order.order[y, x]:
                m = max(m, wave[ny, nx] + 1)
        wave[y, x] = m
    out = [[] for _ in range(int(wave.max()) + 1)]
    for x, y in cells:  # decode order within a wave (host-path parity)
        out[wave[y, x]].append((x, y))
    return out


def _seg_indices(x0, y0, s, w, h):
    """Flat indices for [lb(s), l(s), corner(1), t(s), tr(s)], clamped."""

    def clamp_flat(x, y):
        return min(max(y, 0), h - 1) * w + min(max(x, 0), w - 1)

    idx = []
    # left segments are emitted BOTTOM-first: the substitution scan runs
    # from p[-1][2S-1] upward (§8.4.4.2.2)
    for i in range(s):
        idx.append(clamp_flat(x0 - 1, y0 + 2 * s - 1 - i))
    for i in range(s):
        idx.append(clamp_flat(x0 - 1, y0 + s - 1 - i))
    idx.append(clamp_flat(x0 - 1, y0 - 1))
    for i in range(s):
        idx.append(clamp_flat(x0 + i, y0 - 1))
    for i in range(s):
        idx.append(clamp_flat(x0 + s + i, y0 - 1))
    return idx


@lru_cache(maxsize=8)
def _geometry(w: int, h: int, log2_ctu: int) -> _Geometry:
    order = BlockOrder(w, h, log2_ctu)
    w8, h8 = w // 8, h // 8
    waves = _compute_waves(w8, h8, order)
    steps = len(waves)
    bmax = max(len(wv) for wv in waves)
    cw = w // 2
    ctu = 1 << log2_ctu

    mask = np.zeros((steps, bmax), dtype=bool)
    cell_idx = np.zeros((steps, bmax), dtype=np.int32)
    avail = np.zeros((steps, bmax, 5), dtype=bool)
    ml_i = np.zeros((steps, bmax), dtype=np.int32)
    ml_ok = np.zeros((steps, bmax), dtype=bool)
    ma_i = np.zeros((steps, bmax), dtype=np.int32)
    ma_ok = np.zeros((steps, bmax), dtype=bool)
    y_seg = np.zeros((steps, bmax, 33), dtype=np.int32)
    y_blk = np.zeros((steps, bmax, 64), dtype=np.int32)
    c_seg = np.zeros((steps, bmax, 17), dtype=np.int32)
    c_blk = np.zeros((steps, bmax, 16), dtype=np.int32)

    for s_i, wv in enumerate(waves):
        for b, (x8, y8) in enumerate(wv):
            mask[s_i, b] = True
            cell_idx[s_i, b] = y8 * w8 + x8
            avail[s_i, b] = [
                order.precedes(x8 - 1, y8 + 1, x8, y8),
                order.precedes(x8 - 1, y8, x8, y8),
                order.precedes(x8 - 1, y8 - 1, x8, y8),
                order.precedes(x8, y8 - 1, x8, y8),
                order.precedes(x8 + 1, y8 - 1, x8, y8),
            ]
            ml_ok[s_i, b] = x8 > 0
            ml_i[s_i, b] = y8 * w8 + max(x8 - 1, 0)
            above_ok = y8 > 0 and ((y8 * 8) % ctu) != 0
            ma_ok[s_i, b] = above_ok
            ma_i[s_i, b] = max(y8 - 1, 0) * w8 + x8
            x0, y0 = x8 * 8, y8 * 8
            y_seg[s_i, b] = _seg_indices(x0, y0, 8, w, h)
            y_blk[s_i, b] = [
                (y0 + yy) * w + x0 + xx for yy in range(8) for xx in range(8)
            ]
            cx0, cy0 = x8 * 4, y8 * 4
            c_seg[s_i, b] = _seg_indices(cx0, cy0, 4, cw, h // 2)
            c_blk[s_i, b] = [
                (cy0 + yy) * cw + cx0 + xx for yy in range(4) for xx in range(4)
            ]
    return _Geometry(steps, bmax, mask, cell_idx, avail, ml_i, ml_ok, ma_i,
                     ma_ok, y_seg, y_blk, c_seg, c_blk)


def _substitute(segs, avail, s, fill):
    """Vectorized §8.4.4.2.2 substitution at segment granularity.
    segs: (B, 4s+1) raw samples in order [lb, l, c, t, tr]; avail: (B,5)."""
    import jax.numpy as jnp

    bounds = [0, s, 2 * s, 2 * s + 1, 3 * s + 1, 4 * s + 1]
    parts = [segs[:, bounds[i] : bounds[i + 1]] for i in range(5)]
    a = [avail[:, i : i + 1] for i in range(5)]
    # first available segment's first sample (default mid-gray)
    fa = jnp.full_like(parts[0][:, :1], fill)
    for i in (4, 3, 2, 1, 0):
        fa = jnp.where(a[i], parts[i][:, :1], fa)
    out = []
    last = fa
    for i in range(5):
        seg = jnp.where(a[i], parts[i], last)
        out.append(seg)
        last = seg[:, -1:]
    return out  # list of (B, len) post-substitution segments


def _mpm_cands(a, b):
    """Vectorized intra_mpm_list: (B,) x2 -> (B,3)."""
    import jax.numpy as jnp

    eq = a == b
    lt2 = a < 2
    c0_eq = jnp.where(lt2, 0, a)
    c1_eq = jnp.where(lt2, 1, 2 + ((a + 29) % 32))
    c2_eq = jnp.where(lt2, 26, 2 + ((a - 2 + 1) % 32))
    c2_ne = jnp.where(
        (a != 0) & (b != 0), 0, jnp.where((a != 1) & (b != 1), 1, 26)
    )
    c0 = jnp.where(eq, c0_eq, a)
    c1 = jnp.where(eq, c1_eq, b)
    c2 = jnp.where(eq, c2_eq, c2_ne)
    return jnp.stack([c0, c1, c2], axis=-1)


def build_frame_encoder(cfg: EncoderConfig):
    """Returns jitted fn: (orig_y, orig_u, orig_v) -> dense frame arrays.
    Shapes are the coded (min-CU aligned) size; caller pads."""
    import jax
    import jax.numpy as jnp

    sps, qp = cfg.sps, cfg.qp
    bd = sps.bit_depth
    w, h = sps.coded_width, sps.coded_height
    geo = _geometry(w, h, sps.log2_ctu)
    qpc = chroma_qp(qp)
    sqlam_fp = int(round(np.sqrt(qp_to_lambda(qp, cfg.lambda_qp_factor)) * 256))
    maxv = (1 << bd) - 1
    mid = 1 << (bd - 1)
    w8 = w // 8

    g = {
        k: jnp.asarray(getattr(geo, k))
        for k in ("mask", "cell_idx", "avail", "mpm_left_idx", "mpm_left_ok",
                  "mpm_above_idx", "mpm_above_ok", "y_seg", "y_blk", "c_seg",
                  "c_blk")
    }

    def step(state, xs):
        rec_y, rec_u, rec_v, modes, cy_pl, cb_pl, cr_pl = state
        (mask, cell_i, avail, ml_i, ml_ok, ma_i, ma_ok, yseg, yblk, cseg,
         cblk, oy_blk, ou_blk, ov_blk) = xs
        bmax = mask.shape[0]

        # --- luma refs + prediction (all 35 modes) ---
        raw = rec_y[yseg]  # (B, 33)
        lb, l, c, t, tr = _substitute(raw, avail, 8, mid)
        top = jnp.concatenate([c, t, tr], axis=-1)          # (B, 17)
        left = jnp.concatenate([c, l[:, ::-1], lb[:, ::-1]], axis=-1)
        preds = predict_all_modes(top, left, 8, True, bd,
                                  sps.strong_intra_smoothing)  # (B,35,8,8)

        # --- mode decision: SATD + lambda * MPM-aware bits ---
        oblk = oy_blk.reshape(bmax, 1, 8, 8)
        h8m = jnp.asarray(hadamard(8))
        d = oblk - preds
        sat = (jnp.abs(h8m @ d @ h8m.T).sum(axis=(-1, -2)) + 2) >> 2  # (B,35)
        lm = jnp.where(ml_ok, modes[ml_i], 1)
        am = jnp.where(ma_ok, modes[ma_i], 1)
        cands = _mpm_cands(lm, am)  # (B,3)
        mode_ids = jnp.arange(35)[None, :]
        in_mpm = (mode_ids[:, :, None] == cands[:, None, :]).any(-1)
        bits = jnp.where(in_mpm, 2, 6)
        cost = sat + ((bits * sqlam_fp) >> 8)
        mode = jnp.argmin(cost, axis=-1)  # (B,)
        pred = jnp.take_along_axis(
            preds, mode[:, None, None, None], axis=1
        )[:, 0]

        # --- luma transform/quant/recon ---
        resi = oblk[:, 0] - pred
        coef = tx.forward_transform(resi, bd)
        lvl = tx.quantize(coef, qp, 3, bd, True)
        cbf = (lvl != 0).any(axis=(-1, -2))
        deq = tx.dequantize(lvl, qp, 3, bd)
        r = tx.inverse_transform(deq, bd)
        rec = jnp.clip(pred + r, 0, maxv)
        rec = jnp.where(cbf[:, None, None], rec, pred)

        safe_blk = jnp.where(mask[:, None], yblk, rec_y.shape[0] - 1)
        rec_y = rec_y.at[safe_blk.reshape(-1)].set(
            rec.reshape(bmax * 64), mode="drop")
        cy_pl = cy_pl.at[safe_blk.reshape(-1)].set(
            lvl.reshape(bmax * 64), mode="drop")
        safe_cell = jnp.where(mask, cell_i, modes.shape[0] - 1)
        modes = modes.at[safe_cell].set(mode.astype(jnp.int32), mode="drop")

        # --- chroma (DM mode), both planes ---
        def chroma(plane, coeff_pl, o_blk):
            rawc = plane[cseg]
            lbc, lc, cc, tc, trc = _substitute(rawc, avail, 4, mid)
            topc = jnp.concatenate([cc, tc, trc], axis=-1)
            leftc = jnp.concatenate([cc, lc[:, ::-1], lbc[:, ::-1]], axis=-1)
            cpreds = predict_all_modes(topc, leftc, 4, False, bd, False)
            cpred = jnp.take_along_axis(
                cpreds, mode[:, None, None, None], axis=1
            )[:, 0]
            cresi = o_blk.reshape(bmax, 4, 4) - cpred
            ccoef = tx.forward_transform(cresi, bd)
            clvl = tx.quantize(ccoef, qpc, 2, bd, True)
            ccbf = (clvl != 0).any(axis=(-1, -2))
            cdeq = tx.dequantize(clvl, qpc, 2, bd)
            cr_ = tx.inverse_transform(cdeq, bd)
            crec = jnp.clip(cpred + cr_, 0, maxv)
            crec = jnp.where(ccbf[:, None, None], crec, cpred)
            safe_c = jnp.where(mask[:, None], cblk, plane.shape[0] - 1)
            plane = plane.at[safe_c.reshape(-1)].set(
                crec.reshape(bmax * 16), mode="drop")
            coeff_pl = coeff_pl.at[safe_c.reshape(-1)].set(
                clvl.reshape(bmax * 16), mode="drop")
            return plane, coeff_pl

        rec_u, cb_pl = chroma(rec_u, cb_pl, ou_blk)
        rec_v, cr_pl = chroma(rec_v, cr_pl, ov_blk)
        return (rec_y, rec_u, rec_v, modes, cy_pl, cb_pl, cr_pl), None

    def encode(oy, ou, ov):
        oy_f = jnp.concatenate([oy.reshape(-1).astype(jnp.int32), jnp.zeros(1, jnp.int32)])
        ou_f = jnp.concatenate([ou.reshape(-1).astype(jnp.int32), jnp.zeros(1, jnp.int32)])
        ov_f = jnp.concatenate([ov.reshape(-1).astype(jnp.int32), jnp.zeros(1, jnp.int32)])
        state = (
            jnp.zeros(h * w + _PAD, jnp.int32),
            jnp.zeros(h * w // 4 + _PAD, jnp.int32),
            jnp.zeros(h * w // 4 + _PAD, jnp.int32),
            jnp.zeros(h * w // 64 + _PAD, jnp.int32),
            jnp.zeros(h * w + _PAD, jnp.int32),
            jnp.zeros(h * w // 4 + _PAD, jnp.int32),
            jnp.zeros(h * w // 4 + _PAD, jnp.int32),
        )
        xs = (
            g["mask"], g["cell_idx"], g["avail"], g["mpm_left_idx"],
            g["mpm_left_ok"], g["mpm_above_idx"], g["mpm_above_ok"],
            g["y_seg"], g["y_blk"], g["c_seg"], g["c_blk"],
            oy_f[g["y_blk"]], ou_f[g["c_blk"]], ov_f[g["c_blk"]],
        )
        (rec_y, rec_u, rec_v, modes, cy_pl, cb_pl, cr_pl), _ = jax.lax.scan(
            step, state, xs)
        return (
            rec_y[:-_PAD].reshape(h, w),
            rec_u[:-_PAD].reshape(h // 2, w // 2),
            rec_v[:-_PAD].reshape(h // 2, w // 2),
            modes[:-_PAD].reshape(h // 8, w8),
            cy_pl[:-_PAD].reshape(h, w),
            cb_pl[:-_PAD].reshape(h // 2, w // 2),
            cr_pl[:-_PAD].reshape(h // 2, w // 2),
        )

    return jax.jit(encode)


def encode_frames_intra_jax_batch(frames, cfg: EncoderConfig, _cache={}):
    """Encode a LIST of frames in one device call (vmapped scan + a single
    packed device->host fetch — all-intra frames are independent, and the
    remote-TPU tunnel makes per-fetch latency the bottleneck).

    Returns a list of (FrameSyntax, (ry, ru, rv))."""
    import jax
    import jax.numpy as jnp

    from ..entropy.syntax import FrameSyntax
    from .recon import _pad_to

    sps = cfg.sps
    w, h = sps.coded_width, sps.coded_height
    key = ("batch", len(frames), w, h, cfg.qp, sps.log2_ctu, sps.bit_depth,
           sps.strong_intra_smoothing, cfg.lambda_qp_factor)
    fn = _cache.get(key)
    if fn is None:
        single = build_frame_encoder(cfg)

        def packed(oys, ous, ovs):
            outs = jax.vmap(single)(oys, ous, ovs)
            # pack everything into one int32 buffer: one host fetch
            return jnp.concatenate([o.reshape(len(frames), -1) for o in outs],
                                   axis=1)

        fn = jax.jit(packed)
        _cache[key] = fn
    oys = np.stack([_pad_to(np.asarray(f[0]), h, w) for f in frames])
    ous = np.stack([_pad_to(np.asarray(f[1]), h // 2, w // 2) for f in frames])
    ovs = np.stack([_pad_to(np.asarray(f[2]), h // 2, w // 2) for f in frames])
    buf = np.asarray(fn(jnp.asarray(oys), jnp.asarray(ous), jnp.asarray(ovs)))
    sizes = [h * w, h * w // 4, h * w // 4, h * w // 64,
             h * w, h * w // 4, h * w // 4]
    shapes = [(h, w), (h // 2, w // 2), (h // 2, w // 2), (h // 8, w // 8),
              (h, w), (h // 2, w // 2), (h // 2, w // 2)]
    results = []
    for i in range(len(frames)):
        parts = []
        off = 0
        for sz, shp in zip(sizes, shapes):
            parts.append(buf[i, off : off + sz].reshape(shp))
            off += sz
        ry, ru, rv, modes, cy, cb, cr = parts
        fs = FrameSyntax(w, h)
        fs.luma_mode[:] = modes
        fs.chroma_mode[:] = 4
        fs.coeff_y[:] = cy
        fs.coeff_cb[:] = cb
        fs.coeff_cr[:] = cr
        results.append((fs, (ry, ru, rv)))
    return results


def encode_frame_intra_jax(orig_y, orig_u, orig_v, cfg: EncoderConfig,
                           _cache={}):
    """Drop-in replacement for codec.recon.encode_frame_intra."""
    import jax.numpy as jnp

    from ..entropy.syntax import FrameSyntax
    from .recon import _pad_to

    sps = cfg.sps
    w, h = sps.coded_width, sps.coded_height
    key = (w, h, cfg.qp, sps.log2_ctu, sps.bit_depth,
           sps.strong_intra_smoothing, cfg.lambda_qp_factor)
    fn = _cache.get(key)
    if fn is None:
        fn = build_frame_encoder(cfg)
        _cache[key] = fn
    oy = _pad_to(np.asarray(orig_y), h, w)
    ou = _pad_to(np.asarray(orig_u), h // 2, w // 2)
    ov = _pad_to(np.asarray(orig_v), h // 2, w // 2)
    ry, ru, rv, modes, cy, cb, cr = (np.asarray(a) for a in fn(
        jnp.asarray(oy), jnp.asarray(ou), jnp.asarray(ov)))
    fs = FrameSyntax(w, h)
    fs.luma_mode[:] = modes
    fs.chroma_mode[:] = 4
    fs.coeff_y[:] = cy
    fs.coeff_cb[:] = cb
    fs.coeff_cr[:] = cr
    return fs, (ry, ru, rv)
