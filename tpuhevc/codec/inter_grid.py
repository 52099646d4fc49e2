"""Plane-level LD-P device stage (v2) for 16-aligned picture sizes.

Replaces the per-block-gather formulation of inter_batch with whole-frame
dense compute shaped for the TPU VPU/MXU (lane dim = picture width):

- hierarchical ME: dense coarse SAD on a 4x sum-pooled pyramid (one shifted
  abs-diff stack for the whole frame), then a 7x7 full-pel refinement on
  per-block gathered windows. Replaces the dense (2R+1)^2 search whose
  int16 work was ~16 ms/frame on v5e at R=16 (the TZ-search equivalent:
  coarse placement + local refinement, TEncSearch.cpp:4737).
- MC via DCT-IF phase planes: all 16 luma (8x8 chroma) fractional-phase
  planes are built once per frame with static shift-MACs, then per-pixel
  predictions are one flat gather indexed by each block's MV/phase
  (TComInterpolationFilter.cpp:57-76 taps; §8.5.3.3.3 semantics with
  edge-clamp padding).
- transforms in plane layout: the vertical stage is einsum over the
  reshaped (nblk, S, W) sublane axis; the horizontal stage reuses the same
  form on the transposed plane. Integer-exact (fp32 was measured non-exact
  on the MXU and is not used).
- no scatters: class-16 and class-32 results live in whole-frame planes
  composed with a use32 mask (reshape/where only).
- chroma U and V are processed as one [U | V] side-by-side plane so every
  chroma op runs once.

Interface mirrors inter_batch.build_ldp_scan / collect_frame.
"""

from __future__ import annotations

import numpy as np

from ..utils.tables import chroma_qp, qp_to_lambda
from .inter_enc import _full_lambda_fp
from .params import EncoderConfig

_BUILD_CACHE: dict = {}

_OVH = 16  # flat per-CU syntax overhead estimate (bits) for the 32-vs-16 choice


def supports(cfg) -> bool:
    sps = cfg.sps
    return (sps.coded_width % 16 == 0 and sps.coded_height % 16 == 0
            and sps.bit_depth == 8)


def _mvd_bits_np(v):
    """Exp-Golomb-ish bit cost of a quarter-pel mvd component vs zero
    (mirrors ops/me.mv_bits_table)."""
    return (2 * np.ceil(np.log2(2 * np.abs(v).astype(np.int64) + 1))
            .astype(np.int32) + 1)


def _xor_mask(h: int, w: int) -> np.ndarray:
    """Per-pixel xor mask of the checksum picture hash (D.3.19)."""
    x = np.arange(w, dtype=np.int32)
    y = np.arange(h, dtype=np.int32)
    return ((x[None, :] & 0xFF) ^ (y[:, None] & 0xFF)
            ^ (x[None, :] >> 8) ^ (y[:, None] >> 8)).astype(np.int32)


def _lvl8(cfg) -> bool:
    offs = tuple(cfg.gop_qp_offsets) or (0,)
    return min(min(max(cfg.qp + o, 0), 51) for o in offs) >= 27


def build_ldp_grid_scan(cfg: EncoderConfig, nn_by_qp: dict, n_gops: int):
    import jax
    import jax.numpy as jnp

    from ..models import nnfme
    from ..ops import transforms as tx
    from ..ops.interp import CHROMA_TAPS, LUMA_TAPS

    sps = cfg.sps
    W, H = sps.coded_width, sps.coded_height
    bd = sps.bit_depth
    maxv = (1 << bd) - 1
    # coarse stage graph grows with (sr/2+1)^2; cap at 16 until the coarse
    # search is itself hierarchical (matches the v1 stage's cap)
    sr = max(4, min(cfg.search_range, 16)) // 4 * 4
    offs = tuple(cfg.gop_qp_offsets) or (0,)
    G = len(offs)
    qps = tuple(min(max(cfg.qp + o, 0), 51) for o in offs)
    lvl8 = _lvl8(cfg)
    fetch_recon = cfg.fetch_recon or cfg.hash_type != "checksum"
    R = max(1, cfg.num_ref_frames)
    key = ("v2", W, H, bd, sr, cfg.fme_mode, qps, n_gops, fetch_recon,
           R, cfg.nn_weights_dir, not nn_by_qp.get(qps[0]))
    hit = _BUILD_CACHE.get(key)
    if hit is not None:
        return hit

    nh16, nw16 = H // 16, W // 16
    nh32, nw32 = H // 32, W // 32
    n16 = nh16 * nw16
    n32 = nh32 * nw32
    has32 = n32 > 0
    Hc, Wc = H // 2, W // 2  # chroma frame; UV packed side by side (Hc, W)

    # ME constants ------------------------------------------------------
    # coarse on the 2x sum-pooled pyramid: one step = 2 full-pel; fine
    # grain survives 2x pooling (4x killed the alignment signal and cost
    # ~13% bits on grainy content), odd offsets are the refine stage's job
    R2 = sr // 2
    nc = 2 * R2 + 1
    coarse_bits = np.zeros((nc, nc), np.int32)
    for dy in range(nc):
        for dx in range(nc):
            coarse_bits[dy, dx] = (_mvd_bits_np(8 * (dx - R2))
                                   + _mvd_bits_np(8 * (dy - R2)))
    ref_off = np.arange(-3, 4)

    _IDX49_CACHE: dict = {}

    def _idx49(S, win):
        key = (S, win)
        hit = _IDX49_CACHE.get(key)
        if hit is None:
            base = (np.arange(S)[:, None] * win + np.arange(S)[None]
                    ).reshape(1, S, S)
            offs = (np.repeat(np.arange(7), 7)[:, None, None] * win
                    + np.tile(np.arange(7), 7)[:, None, None])
            hit = jnp.asarray((base + offs).astype(np.int32))
            _IDX49_CACHE[key] = hit
        return hit
    rdxs = np.tile(ref_off, 7)      # (49,) offset x per refine point
    rdys = np.repeat(ref_off, 7)    # (49,) offset y

    # interp margins (mv integer reach = sr + 4 after refine + NN frac)
    LOOK = sr + 4
    PADL = LOOK + 4
    LOOKC = sr // 2 + 2
    PADC = LOOKC + 2
    HmL, WmL = H + 2 * LOOK, W + 2 * LOOK
    HmC, WmC = Hc + 2 * LOOKC, Wc + 2 * LOOKC

    nn_dev = {}
    if cfg.fme_mode == "nn":
        for qp in set(qps):
            p = nn_by_qp.get(qp)
            if p is not None:
                nn_dev[qp] = {k: jnp.asarray(v) for k, v in p.items()}
    cls2q = jnp.asarray(nnfme.CLASS_TO_QMV)

    _REF_BITS = [min(r + 1, max(1, R - 1)) for r in range(R)]

    taps_l = np.asarray(LUMA_TAPS)
    taps_c = np.asarray(CHROMA_TAPS)

    def u8(x):
        return jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(-1)

    # --- transforms in plane layout -------------------------------------
    def vert_stage(p, S, shift, inv=False):
        T = jnp.asarray(tx._matrix(S, False), jnp.int32)
        hp, wp = p.shape
        x = p.reshape(hp // S, S, wp)
        eq = "jk,bjx->bkx" if inv else "kj,bjx->bkx"
        r = jnp.einsum(eq, T, x)
        r = (r + (1 << (shift - 1))) >> shift
        return r.reshape(hp, wp)

    def hor_stage(p, S, shift, inv=False):
        return vert_stage(p.T, S, shift, inv).T

    def fwd_tx(p, S):
        log2 = S.bit_length() - 1
        h = hor_stage(p, S, log2 + bd - 9)
        return vert_stage(h, S, log2 + 6)

    def inv_tx(c, S):
        g = jnp.clip(vert_stage(c, S, 7, inv=True), -32768, 32767)
        r = hor_stage(g, S, 20 - bd, inv=True)
        return jnp.clip(r, -32768, 32767)

    def quant_plane(c, qp, log2):
        per, rem = qp // 6, qp % 6
        qbits = 14 + per + (tx.MAX_TR_DYNAMIC_RANGE - bd - log2)
        add = 85 << (qbits - 9)
        scale = int(tx.QUANT_SCALES[rem])
        lvl = (jnp.abs(c) * scale + add) >> qbits
        lim = 127 if lvl8 else 32767
        return jnp.clip(jnp.sign(c) * lvl, -lim, lim)

    def deq_plane(lvl, qp, log2):
        per, rem = qp // 6, qp % 6
        bdshift = bd + log2 - 5
        scale = 16 * int(tx.INV_QUANT_SCALES[rem])
        x = lvl * scale
        if per < bdshift:
            sh = bdshift - per
            d = (x + (1 << (sh - 1))) >> sh
        else:
            d = x << (per - bdshift)
        return jnp.clip(d, -32768, 32767)

    def bits_plane(lvl):
        a = jnp.abs(lvl)
        bl = jnp.zeros_like(a)
        for k in range(15):
            bl = bl + (a > (1 << k) - 1).astype(a.dtype)
        return 2 * bl + (a > 0)

    def tile_sum(p, t):
        hh, ww = p.shape
        return p.reshape(hh // t, t, ww // t, t).sum((1, 3))

    def up(p, t):
        return jnp.repeat(jnp.repeat(p, t, 0), t, 1)

    # --- ME --------------------------------------------------------------
    def coarse_stack(oy2, ry2p):
        sads = []
        for dy in range(nc):
            for dx in range(nc):
                d = jnp.abs(ry2p[dy : dy + H // 2, dx : dx + W // 2] - oy2)
                sads.append(tile_sum(d.astype(jnp.int32), 8) << 1)
        return jnp.stack(sads)  # (nc*nc, nh16, nw16), ~full-SAD scale

    def pick_coarse(s16, lam_me, nbh, nbw, agg):
        s = s16
        if agg:
            s = s[:, : nbh * 2, : nbw * 2].reshape(-1, nbh, 2, nbw, 2).sum(
                (2, 4))
        cost = s + ((jnp.asarray(coarse_bits.reshape(-1))[:, None, None]
                     * lam_me) >> 8)
        ci = jnp.argmin(cost.reshape(nc * nc, -1), axis=0)
        cy = ci // nc - R2
        cx = ci % nc - R2
        return cx.astype(jnp.int32), cy.astype(jnp.int32)

    def _refine_grid(ry, cur, bx, by, ccx, ccy, S, lam_me):
        """7x7 SAD grid at full-pel centers (ccx, ccy) per block.
        Returns (sad (nb,49), cost (nb,49) masked to the inner 5x5)."""
        win = S + 6
        yy = jnp.clip(by[:, None] + ccy[:, None] - 3
                      + jnp.arange(win)[None], 0, H - 1)
        xx = jnp.clip(bx[:, None] + ccx[:, None] - 3
                      + jnp.arange(win)[None], 0, W - 1)
        wnd = jnp.take(ry.reshape(-1),
                       yy[:, :, None] * W + xx[:, None, :]).astype(jnp.int16)
        # one static gather for all 49 offset windows (was 49 slice ops)
        i49 = _idx49(S, win)
        sl = jnp.take(wnd.reshape(wnd.shape[0], -1), i49, axis=1)
        sad = jnp.abs(sl - cur[:, None]).astype(jnp.int32).sum((-1, -2))
        mvx = ccx[:, None] + jnp.asarray(rdxs)[None]
        mvy = ccy[:, None] + jnp.asarray(rdys)[None]
        babs = (2 * jnp.ceil(jnp.log2(2.0 * jnp.abs(mvx * 4) + 1))
                .astype(jnp.int32)
                + 2 * jnp.ceil(jnp.log2(2.0 * jnp.abs(mvy * 4) + 1))
                .astype(jnp.int32) + 2)
        cost = sad + ((babs * lam_me) >> 8)
        inner = (np.abs(rdxs) <= 2) & (np.abs(rdys) <= 2)
        cost = jnp.where(jnp.asarray(inner)[None], cost, jnp.int32(1 << 30))
        return sad, cost, mvx, mvy

    def refine(ry, oy, cx4, cy4, S, nbh, nbw, lam_me, with_zero=True):
        """Full-pel refinement: 7x7 grids around the coarse winner AND
        (optionally) the zero MV (the TZ predictor set's start candidates),
        best of both; argmin restricted to each grid's inner 5x5 so the
        3x3 SAD surface exists. Returns (mv_int, sad9, best_cost)."""
        nb = nbh * nbw
        bx = jnp.asarray((np.arange(nbw) * S)[None, :].repeat(nbh, 0)
                         .reshape(-1))
        by = jnp.asarray((np.arange(nbh) * S)[:, None].repeat(nbw, 1)
                         .reshape(-1))
        ccx = cx4.reshape(-1) * 2   # coarse units = 2 full-pel
        ccy = cy4.reshape(-1) * 2
        cur = oy[: nbh * S, : nbw * S].reshape(
            nbh, S, nbw, S).transpose(0, 2, 1, 3).reshape(nb, S, S)
        cur = cur.astype(jnp.int16)
        grids = [_refine_grid(ry, cur, bx, by, ccx, ccy, S, lam_me)]
        if with_zero:
            zero = jnp.zeros_like(ccx)
            grids.append(_refine_grid(ry, cur, bx, by, zero, zero, S,
                                      lam_me))
        sad = jnp.concatenate([g[0] for g in grids], axis=1)
        cost = jnp.concatenate([g[1] for g in grids], axis=1)
        mvx = jnp.concatenate([g[2] for g in grids], axis=1)
        mvy = jnp.concatenate([g[3] for g in grids], axis=1)
        bi = jnp.argmin(cost, axis=1)
        bdy = (bi % 49) // 7
        bdx = bi % 7
        mv = jnp.stack([jnp.take_along_axis(mvx, bi[:, None], 1)[:, 0],
                        jnp.take_along_axis(mvy, bi[:, None], 1)[:, 0]],
                       axis=-1)
        base = (bi // 49) * 49
        idx9 = (base[:, None]
                + (bdy[:, None] + jnp.asarray([-1, -1, -1, 0, 0, 0,
                                               1, 1, 1])[None]) * 7
                + (bdx[:, None] + jnp.asarray([-1, 0, 1] * 3)[None]))
        sad9 = jnp.take_along_axis(sad, idx9, 1)
        best_cost = jnp.take_along_axis(cost, bi[:, None], 1)[:, 0]
        # clamp mv into [-(sr+3), sr+3] (coarse edge + refine can poke out)
        mv = jnp.clip(mv, -(sr + 3), sr + 3)
        return mv, sad9, best_cost

    # --- MC phase planes --------------------------------------------------
    # einsum-batched: every ref / phase / shift in a handful of ops instead
    # of hundreds of per-phase slice+MAC chains (per-op overhead dominated)
    tl_j = jnp.asarray(taps_l)  # (4, 8)
    tc_j = jnp.asarray(taps_c)  # (8, 4)

    def luma_planes_all(ry_stack):
        """(R, H, W) -> (R, 4, 4, HmL, WmL) int16 phase planes."""
        rp = jnp.pad(ry_stack, ((0, 0), (PADL, PADL), (PADL, PADL)),
                     mode="edge")
        hsh = jnp.stack([rp[:, :, i + 1 : i + 1 + WmL] for i in range(8)],
                        axis=1)  # (R, 8, H+2PADL, WmL)
        hst = jnp.einsum("fi,rihw->rfhw", tl_j, hsh)  # (R, 4, ...)
        vsh = jnp.stack([hst[:, :, j + 1 : j + 1 + HmL, :] for j in range(8)],
                        axis=1)  # (R, 8, 4, HmL, WmL)
        pl = jnp.einsum("gj,rjfhw->rgfhw", tl_j, vsh)
        return jnp.clip(((pl >> 6) + 32) >> 6, 0, maxv).astype(jnp.int16)

    def chroma_planes_all(ruv_stack):
        """(R, Hc, W) packed [U|V] -> (pl_u, pl_v) each
        (R, 8, 8, HmC, WmC) int16."""
        halves = jnp.stack([ruv_stack[:, :, :Wc], ruv_stack[:, :, Wc:]],
                           axis=1)  # (R, 2, Hc, Wc)
        rp = jnp.pad(halves, ((0, 0), (0, 0), (PADC, PADC), (PADC, PADC)),
                     mode="edge")
        hsh = jnp.stack([rp[..., i + 1 : i + 1 + WmC] for i in range(4)],
                        axis=2)  # (R, 2, 4, Hc+2PADC, WmC)
        hst = jnp.einsum("fi,ruihw->rufhw", tc_j, hsh)  # (R, 2, 8, ...)
        vsh = jnp.stack([hst[:, :, :, j + 1 : j + 1 + HmC, :]
                         for j in range(4)], axis=2)  # (R, 2, 4, 8, ...)
        pl = jnp.einsum("gj,rujfhw->rugfhw", tc_j, vsh)
        pl = jnp.clip(((pl >> 6) + 32) >> 6, 0, maxv).astype(jnp.int16)
        return pl[:, 0], pl[:, 1]

    def pred_luma(planes, mvq_pix, ref_pix, hp, wp):
        """planes: (R, 4, 4, HmL, WmL); ref_pix: (hp, wp) ref per pixel."""
        ygrid = jnp.arange(hp)[:, None]
        xgrid = jnp.arange(wp)[None, :]
        fx = mvq_pix[..., 0] & 3
        fy = mvq_pix[..., 1] & 3
        ix = (mvq_pix[..., 0] >> 2) + xgrid + LOOK
        iy = (mvq_pix[..., 1] >> 2) + ygrid + LOOK
        idx = (((ref_pix * 16 + fy * 4 + fx) * HmL) + iy) * WmL + ix
        return jnp.take(planes.reshape(-1), idx).astype(jnp.int32)

    def pred_chroma(pl, mvq_pix, ref_pix, hp, wp):
        """pl: (R, 8, 8, HmC, WmC)."""
        ygrid = jnp.arange(hp)[:, None]
        xgrid = jnp.arange(wp)[None, :]
        fx = mvq_pix[..., 0] & 7
        fy = mvq_pix[..., 1] & 7
        ix = (mvq_pix[..., 0] >> 3) + xgrid + LOOKC
        iy = (mvq_pix[..., 1] >> 3) + ygrid + LOOKC
        idx = (((ref_pix * 64 + fy * 8 + fx) * HmC) + iy) * WmC + ix
        return jnp.take(pl.reshape(-1), idx).astype(jnp.int32)

    def nn_refine(qp, sad9, S, nb):
        nn_p = nn_dev.get(qp)
        if nn_p is None:
            return None
        hcat = int(nnfme.height_category(S))
        wcat = int(nnfme.width_category(S))
        logits = nnfme.forward(nn_p, sad9.astype(jnp.float32),
                               jnp.full(nb, hcat), jnp.full(nb, wcat))
        return cls2q[jnp.argmax(logits, axis=-1)].astype(jnp.int32)

    def class_code(qp, lam_full, oy, ouv, planes_y, pl_u, pl_v,
                   mv_grid, ref_grid, S, nbh, nbw):
        """Code every S-block under mv_grid (nbh, nbw, 2 quarter-pel) and
        ref_grid (nbh, nbw). Returns planes + per-block stats."""
        qpc = chroma_qp(qp)
        log2 = S.bit_length() - 1
        Hp, Wp = nbh * S, nbw * S
        oy_c = oy[:Hp, :Wp]
        mvq_pix = up(mv_grid[..., 0], S), up(mv_grid[..., 1], S)
        mvq_pix = jnp.stack(mvq_pix, -1)
        refp = up(ref_grid, S)
        pred_y = pred_luma(planes_y, mvq_pix, refp, Hp, Wp)
        coef = fwd_tx(oy_c - pred_y, S)
        lvl = quant_plane(coef, qp, log2)
        rsd = inv_tx(deq_plane(lvl, qp, log2), S)
        rec = jnp.clip(pred_y + rsd, 0, maxv)
        nzb = tile_sum((lvl != 0).astype(jnp.int32), S)
        rec = jnp.where(up(nzb > 0, S), rec, pred_y)
        d_skip = tile_sum((oy_c - pred_y) ** 2, S)
        d_coded = tile_sum((oy_c - rec) ** 2, S)
        bits_b = tile_sum(bits_plane(lvl), S)
        drop = (d_skip - d_coded) <= (lam_full * bits_b) >> 8
        dropp = up(drop, S)
        lvl = jnp.where(dropp, 0, lvl)
        rec = jnp.where(dropp, pred_y, rec)
        d_tot = jnp.where(drop, d_skip, d_coded)
        bits_tot = jnp.where(drop, 0, bits_b)
        cbf_acc = jnp.where(drop, 0, nzb)

        # chroma (packed [U | V], block size S/2)
        Sc = S // 2
        log2c = Sc.bit_length() - 1
        Hpc, Wpc = Hp // 2, Wp // 2
        mvq_c = jnp.stack([up(mv_grid[..., 0], Sc), up(mv_grid[..., 1], Sc)],
                          -1)  # (Hpc, Wpc, 2)
        refc = up(ref_grid, Sc)
        pu = pred_chroma(pl_u, mvq_c, refc, Hpc, Wpc)
        pv = pred_chroma(pl_v, mvq_c, refc, Hpc, Wpc)
        pred_uv = jnp.concatenate([pu, pv], axis=1)  # (Hpc, 2*Wpc)
        ouv_c = jnp.concatenate([ouv[:Hpc, :Wpc], ouv[:Hpc, Wc : Wc + Wpc]],
                                axis=1)
        coef_c = fwd_tx(ouv_c - pred_uv, Sc)
        lvl_c = quant_plane(coef_c, qpc, log2c)
        rsd_c = inv_tx(deq_plane(lvl_c, qpc, log2c), Sc)
        rec_c = jnp.clip(pred_uv + rsd_c, 0, maxv)
        nzc = tile_sum((lvl_c != 0).astype(jnp.int32), Sc)  # (nbh, 2*nbw)
        rec_c = jnp.where(up(nzc > 0, Sc), rec_c, pred_uv)
        dc_s = tile_sum((ouv_c - pred_uv) ** 2, Sc)
        dc_c = tile_sum((ouv_c - rec_c) ** 2, Sc)
        bits_c = tile_sum(bits_plane(lvl_c), Sc)
        drop_c = (dc_s - dc_c) <= (lam_full * bits_c) >> 8
        dropp_c = up(drop_c, Sc)
        lvl_c = jnp.where(dropp_c, 0, lvl_c)
        rec_c = jnp.where(dropp_c, pred_uv, rec_c)
        duv = jnp.where(drop_c, dc_s, dc_c)
        buv = jnp.where(drop_c, 0, bits_c)
        nzk = jnp.where(drop_c, 0, nzc)
        d_tot = d_tot + duv[:, :nbw] + duv[:, nbw:]
        bits_tot = bits_tot + buv[:, :nbw] + buv[:, nbw:]
        cbf = (cbf_acc + nzk[:, :nbw] + nzk[:, nbw:]) > 0
        return dict(lvl=lvl, rec=rec, lvl_c=lvl_c, rec_c=rec_c,
                    d=d_tot, bits=bits_tot, cbf=cbf)

    def frame_step(ref, fu8, navail, gpos):
        qp = qps[gpos]
        lam_full = _full_lambda_fp(qp)
        lam_me = int(round(np.sqrt(qp_to_lambda(qp, 0.4624)) * 256))
        ry_stack, ruv_stack = ref  # (R, H, W), (R, Hc, W)
        oy = fu8[: W * H].reshape(H, W).astype(jnp.int32)
        ou = fu8[W * H : W * H * 5 // 4].reshape(Hc, Wc)
        ov = fu8[W * H * 5 // 4 :].reshape(Hc, Wc)
        ouv = jnp.concatenate([ou, ov], axis=1).astype(jnp.int32)

        # ME over every L0 reference; per-block best ref by RD cost.
        # Dense coarse search only on ref 0; farther refs seed their
        # refinement from the POC-scaled ref-0 coarse winner (+ the zero
        # candidate inside refine), like TZ predictor seeding.
        oy2 = tile_sum(oy, 2).astype(jnp.int16)
        m16, m32 = [], []
        cx16 = cy16 = cx32 = cy32 = None
        for r in range(R):
            ryr = ry_stack[r]
            if r == 0:
                ry2p = jnp.pad(tile_sum(ryr, 2).astype(jnp.int16), R2,
                               mode="edge")
                s16c = coarse_stack(oy2, ry2p)
                cx16, cy16 = pick_coarse(s16c, lam_me, nh16, nw16, False)
                if has32:
                    cx32, cy32 = pick_coarse(s16c, lam_me, nh32, nw32, True)
            sc = r + 1
            cxr = jnp.clip(cx16 * sc, -R2, R2)
            cyr = jnp.clip(cy16 * sc, -R2, R2)
            m16.append(refine(ryr, oy, cxr, cyr, 16, nh16, nw16, lam_me,
                              with_zero=(r == 0)))
            if has32:
                cxr32 = jnp.clip(cx32 * sc, -R2, R2)
                cyr32 = jnp.clip(cy32 * sc, -R2, R2)
                m32.append(refine(ryr, oy, cxr32, cyr32, 32, nh32, nw32,
                                  lam_me, with_zero=(r == 0)))

        def pick_ref(ms):
            if R == 1:
                mv, sad9, _ = ms[0]
                return mv, sad9, jnp.zeros(mv.shape[0], jnp.int32)
            cost = jnp.stack([m[2] + ((_REF_BITS[r] * lam_me) >> 8)
                              for r, m in enumerate(ms)], axis=1)
            # refs beyond the DPB fill level (early frames) are invalid
            mask = jnp.arange(R)[None] >= navail
            cost = jnp.where(mask, jnp.int32(1 << 30), cost)
            ref = jnp.argmin(cost, axis=1).astype(jnp.int32)
            mv = jnp.stack([m[0] for m in ms], 1)
            sad9 = jnp.stack([m[1] for m in ms], 1)
            mv = jnp.take_along_axis(mv, ref[:, None, None].repeat(2, 2),
                                     1)[:, 0]
            sad9 = jnp.take_along_axis(
                sad9, ref[:, None, None].repeat(9, 2), 1)[:, 0]
            return mv, sad9, ref

        mv16, sad9_16, ref16 = pick_ref(m16)
        mvq16 = mv16 * 4
        if cfg.fme_mode == "nn":
            off = nn_refine(qp, sad9_16, 16, n16)
            if off is not None:
                mvq16 = mvq16 + off
        if has32:
            mv32, sad9_32, ref32 = pick_ref(m32)
            mvq32 = mv32 * 4
            if cfg.fme_mode == "nn":
                off = nn_refine(qp, sad9_32, 32, n32)
                if off is not None:
                    mvq32 = mvq32 + off

        # MC phase planes for every reference (einsum-batched)
        planes_y = luma_planes_all(ry_stack)
        pl_u, pl_v = chroma_planes_all(ruv_stack)

        def smooth_mv(mv_grid, ref_grid, S, nbh, nbw):
            """Merge-coherence smoothing: adopt the left/top neighbor's
            (mv, ref) when its luma prediction is nearly as good — the
            walk then codes those CUs as merge/skip (the reference gets
            this from xCheckRDCostMerge2Nx2N's RD trial of merge
            candidates, TEncCu.cpp:455). Jacobi sweeps, device-batched."""
            Hp, Wp = nbh * S, nbw * S
            oy_c = oy[:Hp, :Wp]
            bonus = (lam_full * 14) >> 8  # merge-vs-AMVP bit saving
            sse0 = None
            for axis, srcsl in ((1, np.s_[:, :1]), (0, np.s_[:1, :]),
                                (1, np.s_[:, :1])):
                if sse0 is None:
                    p0 = pred_luma(planes_y,
                                   jnp.stack([up(mv_grid[..., 0], S),
                                              up(mv_grid[..., 1], S)], -1),
                                   up(ref_grid, S), Hp, Wp)
                    sse0 = tile_sum((oy_c - p0) ** 2, S)
                if axis == 1:
                    mvc = jnp.concatenate([mv_grid[:, :1],
                                           mv_grid[:, :-1]], axis=1)
                    refc = jnp.concatenate([ref_grid[:, :1],
                                            ref_grid[:, :-1]], axis=1)
                else:
                    mvc = jnp.concatenate([mv_grid[:1], mv_grid[:-1]],
                                          axis=0)
                    refc = jnp.concatenate([ref_grid[:1], ref_grid[:-1]],
                                           axis=0)
                pc = pred_luma(planes_y,
                               jnp.stack([up(mvc[..., 0], S),
                                          up(mvc[..., 1], S)], -1),
                               up(refc, S), Hp, Wp)
                ssec = tile_sum((oy_c - pc) ** 2, S)
                adopt = ssec <= sse0 + bonus
                mv_grid = jnp.where(adopt[..., None], mvc, mv_grid)
                ref_grid = jnp.where(adopt, refc, ref_grid)
                sse0 = jnp.where(adopt, ssec, sse0)
            return mv_grid, ref_grid

        mvg16, refg16 = smooth_mv(mvq16.reshape(nh16, nw16, 2),
                                  ref16.reshape(nh16, nw16), 16, nh16,
                                  nw16)
        mvq16 = mvg16.reshape(n16, 2)
        ref16 = refg16.reshape(n16)
        c16 = class_code(qp, lam_full, oy, ouv, planes_y, pl_u, pl_v,
                         mvg16, refg16, 16, nh16, nw16)
        use32 = None
        if has32:
            mvg32, refg32 = smooth_mv(mvq32.reshape(nh32, nw32, 2),
                                      ref32.reshape(nh32, nw32), 32,
                                      nh32, nw32)
            mvq32 = mvg32.reshape(n32, 2)
            ref32 = refg32.reshape(n32)
            c32 = class_code(qp, lam_full, oy, ouv, planes_y, pl_u, pl_v,
                             mvg32, refg32, 32, nh32, nw32)
            d16_ = c16["d"][: nh32 * 2, : nw32 * 2]
            b16_ = c16["bits"][: nh32 * 2, : nw32 * 2]
            c16cost = (d16_ + ((lam_full * (b16_ + _OVH)) >> 8)).reshape(
                nh32, 2, nw32, 2).sum((1, 3))
            c32cost = c32["d"] + ((lam_full * (c32["bits"] + _OVH)) >> 8)
            use32 = c32cost <= c16cost

        # compose final whole-frame planes (c16 chroma already covers the
        # frame: Hpc == Hc, Wpc == Wc, packed [U | V])
        lvl_y, rec_y = c16["lvl"], c16["rec"]
        lvl_uv, rec_uv = c16["lvl_c"], c16["rec_c"]
        if has32:
            H32, W32 = nh32 * 32, nw32 * 32
            mp = up(use32, 32)  # (H32, W32)
            lvl_y = lvl_y.at[:H32, :W32].set(
                jnp.where(mp, c32["lvl"], lvl_y[:H32, :W32]))
            rec_y = rec_y.at[:H32, :W32].set(
                jnp.where(mp, c32["rec"], rec_y[:H32, :W32]))
            h32c, w32c = H32 // 2, W32 // 2
            mpc = up(use32, 16)
            for dst, src in ((0, 0), (Wc, w32c)):
                lvl_uv = lvl_uv.at[:h32c, dst : dst + w32c].set(
                    jnp.where(mpc, c32["lvl_c"][:, src : src + w32c],
                              lvl_uv[:h32c, dst : dst + w32c]))
                rec_uv = rec_uv.at[:h32c, dst : dst + w32c].set(
                    jnp.where(mpc, c32["rec_c"][:, src : src + w32c],
                              rec_uv[:h32c, dst : dst + w32c]))

        ldt = jnp.int8 if lvl8 else jnp.int16
        parts = [u8(lvl_y.astype(ldt)), u8(lvl_uv.astype(ldt))]
        if fetch_recon:
            parts += [rec_y.astype(jnp.uint8).reshape(-1),
                      rec_uv.astype(jnp.uint8).reshape(-1)]
        else:
            # decoded-picture-hash checksum (D.3.19) per plane + SSE vs the
            # original for PSNR — both commutative reductions
            xm = jnp.asarray(_xor_mask(H, W))
            xmc = jnp.asarray(_xor_mask(Hc, Wc))
            cks = jnp.stack([
                ((rec_y & 0xFF) ^ xm).sum().astype(jnp.int32),
                ((rec_uv[:, :Wc] & 0xFF) ^ xmc).sum().astype(jnp.int32),
                ((rec_uv[:, Wc:] & 0xFF) ^ xmc).sum().astype(jnp.int32)])
            sse3 = jnp.stack([
                ((oy - rec_y) ** 2).astype(jnp.float32).sum(),
                ((ouv[:, :Wc] - rec_uv[:, :Wc]) ** 2).astype(jnp.float32).sum(),
                ((ouv[:, Wc:] - rec_uv[:, Wc:]) ** 2).astype(jnp.float32).sum()])
            parts += [u8(cks), u8(sse3)]
        parts += [u8(mvq16.astype(jnp.int16)),
                  u8(sad9_16.astype(jnp.int32)),
                  u8(mv16.astype(jnp.int16)),
                  ref16.astype(jnp.uint8).reshape(-1),
                  c16["cbf"].astype(jnp.uint8).reshape(-1)]
        if has32:
            parts += [u8(mvq32.astype(jnp.int16)),
                      u8(sad9_32.astype(jnp.int32)),
                      u8(mv32.astype(jnp.int16)),
                      ref32.astype(jnp.uint8).reshape(-1),
                      c32["cbf"].astype(jnp.uint8).reshape(-1),
                      use32.astype(jnp.uint8).reshape(-1)]
        new_ry = jnp.concatenate([rec_y[None], ry_stack[:-1]])
        new_ruv = jnp.concatenate([rec_uv[None], ruv_stack[:-1]])
        return (new_ry, new_ruv), jnp.concatenate(parts)

    def gop_step(carry, xs):
        frames_g, navail_g = xs
        outs = []
        for g in range(G):
            carry, pk = frame_step(carry, frames_g[g], navail_g[g], g)
            outs.append(pk)
        return carry, jnp.stack(outs)

    def run(frames_u8, navail, ry_stack, ruv_stack):
        (ry_stack, ruv_stack), packed = jax.lax.scan(
            gop_step, (ry_stack, ruv_stack), (frames_u8, navail))
        return packed.reshape(n_gops * G, -1), ry_stack, ruv_stack

    fn = jax.jit(run, donate_argnums=(2, 3))
    out = (fn, dict(W=W, H=H), qps)
    _BUILD_CACHE[key] = out
    return out


def _parse_frame_buf(cfg, buf: np.ndarray) -> dict:
    """Unpack one fetched frame row into named arrays."""
    sps = cfg.sps
    W, H = sps.coded_width, sps.coded_height
    Hc, Wc = H // 2, W // 2
    nh16, nw16 = H // 16, W // 16
    nh32, nw32 = H // 32, W // 32
    n16, n32 = nh16 * nw16, nh32 * nw32
    lvl8 = _lvl8(cfg)
    ldt = np.int8 if lvl8 else np.int16
    lb = 1 if lvl8 else 2
    off = 0

    def take(nbytes, dtype, shape):
        nonlocal off
        out = np.frombuffer(buf[off : off + nbytes].tobytes(), dtype=dtype)
        off += nbytes
        return out.reshape(shape)

    fetch_recon = cfg.fetch_recon or cfg.hash_type != "checksum"
    d = dict(
        lvl_y=take(W * H * lb, ldt, (H, W)).astype(np.int32),
        lvl_uv=take(W * Hc * lb, ldt, (Hc, W)).astype(np.int32),
    )
    if fetch_recon:
        d.update(rec_y=take(W * H, np.uint8, (H, W)),
                 rec_uv=take(W * Hc, np.uint8, (Hc, W)))
    else:
        d.update(cks=take(12, np.int32, (3,)),
                 sse=take(12, np.float32, (3,)))
    d.update(
        mvq16=take(n16 * 4, np.int16, (n16, 2)).astype(np.int32),
        sad9_16=take(n16 * 36, np.int32, (n16, 9)),
        mv16=take(n16 * 4, np.int16, (n16, 2)).astype(np.int32),
        ref16=take(n16, np.uint8, (n16,)),
        cbf16=take(n16, np.uint8, (n16,)),
    )
    if n32:
        d.update(
            mvq32=take(n32 * 4, np.int16, (n32, 2)).astype(np.int32),
            sad9_32=take(n32 * 36, np.int32, (n32, 9)),
            mv32=take(n32 * 4, np.int16, (n32, 2)).astype(np.int32),
            ref32=take(n32, np.uint8, (n32,)),
            cbf32=take(n32, np.uint8, (n32,)),
            use32=take(n32, np.uint8, (n32,)).reshape(nh32, nw32),
        )
    return d


def assemble_grid_frame(cfg, buf: np.ndarray, num_ref: int = 1):
    """Fetched frame row -> (FrameSyntax, recon[, stats]) via the native
    decision walk; returns None when the native library is unavailable
    (callers fall back to collect_grid_frame + assemble_frame_p)."""
    from ..entropy.native import decision_walk_native
    from ..entropy.syntax import FrameSyntax

    sps = cfg.sps
    W, H = sps.coded_width, sps.coded_height
    Hc, Wc = H // 2, W // 2
    nh32, nw32 = H // 32, W // 32
    d = _parse_frame_buf(cfg, buf)
    if nh32 * nw32 == 0:
        return None  # tiny frames: python walk handles the 16-only case
    maps = decision_walk_native(
        d["mvq16"], d["cbf16"], d["mvq32"], d["cbf32"], d["use32"],
        W, H, sps.log2_ctu, cfg.max_num_merge_cand,
        d["ref16"], d["ref32"], num_ref)
    if maps is None:
        return None
    fs = FrameSyntax(
        W, H, cu_log2=maps["cu_log2"], mv=maps["mv"], skip=maps["skip"],
        merge_flag=maps["merge_flag"], merge_idx=maps["merge_idx"],
        mvp_flag=maps["mvp_flag"], mvd=maps["mvd"],
        ref_idx=maps["ref"],
        coeff_y=np.ascontiguousarray(d["lvl_y"]),
        coeff_cb=np.ascontiguousarray(d["lvl_uv"][:, :Wc]),
        coeff_cr=np.ascontiguousarray(d["lvl_uv"][:, Wc:]),
    )
    if "rec_y" in d:
        rec = (d["rec_y"].astype(np.int32),
               np.ascontiguousarray(d["rec_uv"][:, :Wc]).astype(np.int32),
               np.ascontiguousarray(d["rec_uv"][:, Wc:]).astype(np.int32))
        return fs, rec
    hashes = [int(np.uint32(c)).to_bytes(4, "big") for c in d["cks"]]
    return fs, None, dict(hashes=hashes, hash_type=2, sse=d["sse"])


def collect_grid_frame(cfg, buf: np.ndarray):
    """One fetched frame row -> per_cu dict compatible with
    inter_enc.assemble_frame_p."""
    sps = cfg.sps
    W, H = sps.coded_width, sps.coded_height
    Hc, Wc = H // 2, W // 2
    nh16, nw16 = H // 16, W // 16
    nh32, nw32 = H // 32, W // 32
    n16, n32 = nh16 * nw16, nh32 * nw32
    has32 = n32 > 0
    d = _parse_frame_buf(cfg, buf)
    lvl_y, rec_y = d["lvl_y"], d["rec_y"]
    mvq16, mv16, sad9_16 = d["mvq16"], d["mv16"], d["sad9_16"]
    ref16 = d["ref16"]
    if has32:
        mvq32, mv32, sad9_32 = d["mvq32"], d["mv32"], d["sad9_32"]
        ref32 = d["ref32"]
        use32 = d["use32"].astype(bool)

    lvl_u, lvl_v = d["lvl_uv"][:, :Wc], d["lvl_uv"][:, Wc:]
    rec_u, rec_v = d["rec_uv"][:, :Wc], d["rec_uv"][:, Wc:]
    per_cu = {}

    def emit(x0, y0, size, mv, mvi, s9, ref=0):
        cs = size // 2
        cx, cy = x0 // 2, y0 // 2
        per_cu[(x0, y0)] = dict(
            size=size, mv=mv, mv_int=mvi, sad9=s9, ref=int(ref),
            lvl=lvl_y[y0 : y0 + size, x0 : x0 + size],
            rec=rec_y[y0 : y0 + size, x0 : x0 + size].astype(np.int32),
            lvl_u=lvl_u[cy : cy + cs, cx : cx + cs],
            rec_u=rec_u[cy : cy + cs, cx : cx + cs].astype(np.int32),
            lvl_v=lvl_v[cy : cy + cs, cx : cx + cs],
            rec_v=rec_v[cy : cy + cs, cx : cx + cs].astype(np.int32),
        )

    for b in range(n16):
        by, bx = b // nw16, b % nw16
        if has32 and by < nh32 * 2 and bx < nw32 * 2 \
                and use32[by // 2, bx // 2]:
            continue
        emit(bx * 16, by * 16, 16, mvq16[b], mv16[b], sad9_16[b],
             ref16[b])
    if has32:
        for b in range(n32):
            by, bx = b // nw32, b % nw32
            if use32[by, bx]:
                emit(bx * 32, by * 32, 32, mvq32[b], mv32[b], sad9_32[b],
                     ref32[b])
    return per_cu
