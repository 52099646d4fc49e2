"""B-frame encoding (bi-prediction, two reference lists) + reconstruction.

Counterpart of the reference's B-slice path through predInterSearch's
bi-pred refinement and xPredInterBi/xWeightedAverage (TComPrediction.cpp
:577,683 — SURVEY.md §3.2), restructured as batched per-block candidate
selection: best uni-L0, best uni-L1 and their bi combination are evaluated
for every 16x16 block at once, the winner picked by SSE + lambda*bits.
Bi-prediction averages the two DCT-IF predictions at the 14-bit
intermediate scale (§8.5.3.3.3.2), exactly as the decoder does.

v1 scope: 16x16 CUs, one reference per list (hierarchical GOP), TU = CU.
The host walk (assemble_frame_b) derives merge/skip/AMVP with the shared
two-list derivation (codec/mv_b.py) in decode order.
"""

from __future__ import annotations

import numpy as np

from ..ops import me as me_ops
from ..ops import transforms as tx
from ..ops.interp import bi_average_np, mc_np, mc_np14
from ..utils.tables import chroma_qp, qp_to_lambda
from .inter_enc import _full_lambda_fp
from .mv_b import MvFieldB, amvp_candidates_b, merge_candidates_b
from .params import EncoderConfig
from .recon import _pad_to
from .refsamples import BlockOrder


def _grid16(w, h):
    xs, ys = [], []
    for y0 in range(0, h, 16):
        for x0 in range(0, w, 16):
            xs.append(x0)
            ys.append(y0)
    return np.array(xs), np.array(ys)


def _me_uni(ref_y, cur, xs, ys, sr, lam_fp, nn_params, size=16):
    """Best integer MV per block + NN-FME subpel refinement -> mvq."""
    mv_int, sad_map, best = me_ops.integer_me_np(ref_y, cur, xs, ys, sr,
                                                 lam_fp)
    mvq = mv_int.astype(np.int32) * 4
    if nn_params is not None:
        from ..models import nnfme

        sad9 = me_ops.sad_surface_np(sad_map, best)
        n = len(xs)
        off = nnfme.predict_np(nn_params, sad9.astype(np.float32),
                               np.full(n, size), np.full(n, size))
        mvq = mvq + off.astype(np.int32)
    return mvq


def _code_blocks(cur, pred, qp, log2, bd, lam_full):
    """(lvl, rec, d, bits) with the skip-biased drop, batched."""
    coef = tx.forward_transform_np(cur - pred, bd)
    lvl = tx.quantize_np(coef, qp, log2, bd, False)
    rsd = tx.inverse_transform_np(tx.dequantize_np(lvl, qp, log2, bd), bd)
    rec = np.clip(pred + rsd, 0, (1 << bd) - 1)
    n = lvl.shape[0]
    nz = (lvl != 0).reshape(n, -1).any(axis=1)
    rec = np.where(nz[:, None, None], rec, pred)
    a = np.abs(lvl.reshape(n, -1))
    bl = np.zeros_like(a)
    for k in range(15):
        bl += (a > (1 << k) - 1).astype(a.dtype)
    bits = (2 * bl + (a > 0)).sum(axis=1).astype(np.int64)
    d_skip = ((cur - pred) ** 2).reshape(n, -1).astype(np.int64).sum(axis=1)
    d_coded = ((cur - rec) ** 2).reshape(n, -1).astype(np.int64).sum(axis=1)
    drop = (d_skip - d_coded) <= (lam_full * bits) >> 8
    lvl = np.where(drop[:, None, None], 0, lvl)
    rec = np.where(drop[:, None, None], pred, rec)
    d = np.where(drop, d_skip, d_coded)
    bits = np.where(drop, 0, bits)
    return lvl, rec, d, bits


_B_STEP_CACHE: dict = {}


def _b_step(cfg: EncoderConfig, qp: int, have_nn):
    """Jitted device B-frame compute: dense two-list integer ME, NN-FME
    subpel, 14-bit bi-prediction averaging, uni/uni/bi arbitration, and
    table-cost-RDOQ residual coding for every 16x16 block of the frame
    at once (the device counterpart of the numpy v1 path below; the
    reference's predInterSearch bi-pred machinery, TComPrediction.cpp
    :577,683, restructured as whole-frame candidate selection)."""
    sps = cfg.sps
    w, h, bd = sps.coded_width, sps.coded_height, sps.bit_depth
    sr = max(4, min(cfg.search_range, 16))
    nn_params = have_nn if not isinstance(have_nn, bool) else None
    key = (w, h, bd, qp, sr, id(nn_params) if nn_params else None)
    hit = _B_STEP_CACHE.get(key)
    if hit is not None:
        return hit
    import jax
    import jax.numpy as jnp

    from ..entropy.bitest import FracBits, ResidualBitEst
    from ..models import nnfme
    from ..ops.interp import bi_average, mc, mc14

    nh, nw = h // 16, w // 16
    n = nh * nw
    xs_np, ys_np = _grid16(w, h)
    lam_full = _full_lambda_fp(cfg) / 256.0
    lam_me = float(np.sqrt(lam_full))
    qpc = chroma_qp(qp)
    fb = FracBits(0, qp)  # B-slice init row
    est_y = ResidualBitEst(fb, 4, True)
    est_c = ResidualBitEst(fb, 3, False)
    side = 2 * sr + 1
    # per-offset EG-ish MV bits (static)
    dxs = np.tile(np.arange(side) - sr, side)
    dys = np.repeat(np.arange(side) - sr, side)
    mvb = (2 * np.ceil(np.log2(2.0 * np.abs(dxs * 4) + 1))
           + 2 * np.ceil(np.log2(2.0 * np.abs(dys * 4) + 1))
           + 2).astype(np.float32)
    # 3x3 surface neighbor offsets in the (side*side) flat index space
    nbr9 = np.asarray([(dy * side + dx) for dy in (-1, 0, 1)
                       for dx in (-1, 0, 1)], np.int32)
    maxv = (1 << bd) - 1

    def tile16(p):
        return (p.reshape(nh, 16, nw, 16).transpose(0, 2, 1, 3)
                .reshape(n, 16, 16))

    def untile16(b):
        return (b.reshape(nh, nw, 16, 16).transpose(0, 2, 1, 3)
                .reshape(h, w))

    def tile8(p):
        return (p.reshape(nh, 8, nw, 8).transpose(0, 2, 1, 3)
                .reshape(n, 8, 8))

    def untile8(b):
        return (b.reshape(nh, nw, 8, 8).transpose(0, 2, 1, 3)
                .reshape(h // 2, w // 2))

    def dense_me(oy, ry):
        """(mv_int (n,2), sad9 (n,9)) by a row-scanned dense +-sr
        search (the prestage ps_row pattern: one traced row body)."""
        ryp = jnp.pad(ry, sr, mode="edge")

        def row(carry, dy):
            sads = []
            for dx in range(side):
                d = jax.lax.dynamic_slice(ryp, (dy, dx), (h, w)) - oy
                sads.append(jnp.abs(d).reshape(
                    nh, 16, nw, 16).sum((1, 3)).reshape(n))
            return carry, jnp.stack(sads, 1)  # (n, side)

        _, rows = jax.lax.scan(row, 0, jnp.arange(side))
        sad = rows.transpose(1, 0, 2).reshape(n, side * side)
        cost = sad.astype(jnp.float32) + lam_me * jnp.asarray(mvb)[None]
        bi = jnp.argmin(cost, axis=1).astype(jnp.int32)
        mv = jnp.stack([bi % side - sr, bi // side - sr], -1)
        i9 = jnp.clip(bi[:, None] + jnp.asarray(nbr9)[None], 0,
                      side * side - 1)
        sad9 = jnp.take_along_axis(sad, i9, 1)
        return mv, sad9

    nn_dev = jax.device_put(nn_params) if nn_params else None
    cls2q = jnp.asarray(nnfme.CLASS_TO_QMV)
    xs = jnp.asarray(xs_np)
    ys = jnp.asarray(ys_np)
    cxs = jnp.asarray(xs_np // 2)
    cys = jnp.asarray(ys_np // 2)

    def subpel(mv_int, sad9):
        mvq = mv_int * 4
        if nn_dev is None:
            return mvq
        logits = nnfme.forward(nn_dev, sad9.astype(jnp.float32),
                               jnp.full(n, int(nnfme.height_category(16))),
                               jnp.full(n, int(nnfme.width_category(16))))
        return mvq + cls2q[jnp.argmax(logits, -1)].astype(jnp.int32)

    def code_blocks(cur, pred, q, log2, est):
        coef = tx.forward_transform(cur - pred, bd)
        lvl = tx.rdoq_est_xp(jnp, coef, q, log2, bd, lam_full, est)
        rsd = tx.inverse_transform(tx.dequantize(lvl, q, log2, bd), bd)
        rec = jnp.clip(pred + rsd, 0, maxv)
        nz = (lvl != 0).reshape(n, -1).any(1)
        rec = jnp.where(nz[:, None, None], rec, pred)
        bits = est.tu_bits(jnp, lvl)
        d_skip = ((cur - pred) ** 2).reshape(n, -1).sum(1)
        d_coded = ((cur - rec) ** 2).reshape(n, -1).sum(1)
        drop = (d_skip - d_coded).astype(jnp.float32) <= lam_full * bits
        lvl = jnp.where(drop[:, None, None], 0, lvl)
        rec = jnp.where(drop[:, None, None], pred, rec)
        return lvl, rec

    def step(oy, ou, ov, r0y, r0u, r0v, r1y, r1u, r1v):
        cur = tile16(oy)
        mv0i, sad9_0 = dense_me(oy, r0y)
        mv1i, sad9_1 = dense_me(oy, r1y)
        mvq0 = subpel(mv0i, sad9_0)
        mvq1 = subpel(mv1i, sad9_1)
        p0_14 = mc14(r0y, xs, ys, mvq0, 16, True, bd)
        p1_14 = mc14(r1y, xs, ys, mvq1, 16, True, bd)
        pred0 = mc(r0y, xs, ys, mvq0, 16, True, bd)
        pred1 = mc(r1y, xs, ys, mvq1, 16, True, bd)
        pred_bi = bi_average(p0_14, p1_14, bd)

        def sse(p):
            return ((cur - p) ** 2).reshape(n, -1).sum(1) \
                .astype(jnp.float32)

        b0 = (jnp.abs(mvq0).sum(1) // 4 + 4).astype(jnp.float32)
        b1 = (jnp.abs(mvq1).sum(1) // 4 + 4).astype(jnp.float32)
        cost0 = sse(pred0) + lam_full * (b0 + 2)
        cost1 = sse(pred1) + lam_full * (b1 + 2)
        cost_bi = sse(pred_bi) + lam_full * (b0 + b1 + 2)
        inter_dir = jnp.where(
            cost_bi <= jnp.minimum(cost0, cost1), 3,
            jnp.where(cost0 <= cost1, 1, 2)).astype(jnp.int32)
        pd = inter_dir[:, None, None]
        pred_y = jnp.where(pd == 1, pred0,
                           jnp.where(pd == 2, pred1, pred_bi))
        lvl_y, rec_y = code_blocks(cur, pred_y, qp, 4, est_y)
        outs = [mvq0, mvq1, inter_dir, lvl_y, rec_y]
        for plane, rp0, rp1 in ((ou, r0u, r1u), (ov, r0v, r1v)):
            cur_c = tile8(plane)
            c0_14 = mc14(rp0, cxs, cys, mvq0, 8, False, bd)
            c1_14 = mc14(rp1, cxs, cys, mvq1, 8, False, bd)
            c0 = mc(rp0, cxs, cys, mvq0, 8, False, bd)
            c1 = mc(rp1, cxs, cys, mvq1, 8, False, bd)
            cbi = bi_average(c0_14, c1_14, bd)
            pred_c = jnp.where(pd == 1, c0, jnp.where(pd == 2, c1, cbi))
            lvl_c, rec_c = code_blocks(cur_c, pred_c, qpc, 3, est_c)
            outs += [lvl_c, rec_c]
        return tuple(outs)

    import jax

    fn = jax.jit(step)
    _B_STEP_CACHE[key] = fn
    return fn


def encode_frame_b(orig, ref_l0, ref_l1, cfg: EncoderConfig, qp: int,
                   l0_pocs, l1_pocs, cur_poc: int, nn_params=None):
    """orig: (y, u, v); ref_l0/ref_l1: one (y, u, v) recon each.
    Returns (FrameSyntax, recon)."""
    sps = cfg.sps
    bd = sps.bit_depth
    w, h = sps.coded_width, sps.coded_height
    oy = _pad_to(np.asarray(orig[0]), h, w).astype(np.int32)
    ou = _pad_to(np.asarray(orig[1]), h // 2, w // 2).astype(np.int32)
    ov = _pad_to(np.asarray(orig[2]), h // 2, w // 2).astype(np.int32)
    r0 = [p.astype(np.int32) for p in ref_l0]
    r1 = [p.astype(np.int32) for p in ref_l1]
    if cfg.inter_backend == "jax":
        try:
            import jax  # noqa: F401

            have = True
        except Exception:
            have = False
        if have:
            fn = _b_step(cfg, qp, nn_params)
            out = fn(*(np.asarray(a) for a in
                       (oy, ou, ov, r0[0], r0[1], r0[2],
                        r1[0], r1[1], r1[2])))
            (mvq0, mvq1, inter_dir, lvl_y, rec_y, lvl_u, rec_u,
             lvl_v, rec_v) = (np.asarray(a) for a in out)
            xs, ys = _grid16(w, h)
            return assemble_frame_b(cfg, dict(
                xs=xs, ys=ys, inter_dir=inter_dir, mvq0=mvq0, mvq1=mvq1,
                lvl_y=lvl_y, rec_y=rec_y, lvl_u=lvl_u, rec_u=rec_u,
                lvl_v=lvl_v, rec_v=rec_v), l0_pocs, l1_pocs, cur_poc)
    lam_full = _full_lambda_fp(cfg)
    lam_me = int(round(np.sqrt(lam_full / 256.0) * 256))
    qpc = chroma_qp(qp)
    sr = min(cfg.search_range, 8)

    xs, ys = _grid16(w, h)
    n = len(xs)
    cur = np.stack([oy[y : y + 16, x : x + 16] for x, y in zip(xs, ys)])

    mvq0 = _me_uni(r0[0], cur, xs, ys, sr, lam_me, nn_params)
    mvq1 = _me_uni(r1[0], cur, xs, ys, sr, lam_me, nn_params)
    p0_14 = mc_np14(r0[0], xs, ys, mvq0, 16, True, bd)
    p1_14 = mc_np14(r1[0], xs, ys, mvq1, 16, True, bd)
    pred0 = mc_np(r0[0], xs, ys, mvq0, 16, True, bd)
    pred1 = mc_np(r1[0], xs, ys, mvq1, 16, True, bd)
    pred_bi = bi_average_np(p0_14, p1_14, bd)

    def sse(p):
        return ((cur - p) ** 2).reshape(n, -1).astype(np.int64).sum(axis=1)

    mvbits = (np.abs(mvq0).sum(1) // 4 + 4, np.abs(mvq1).sum(1) // 4 + 4)
    cost0 = sse(pred0) + ((lam_full * (mvbits[0] + 2)) >> 8)
    cost1 = sse(pred1) + ((lam_full * (mvbits[1] + 2)) >> 8)
    cost_bi = sse(pred_bi) + ((lam_full * (mvbits[0] + mvbits[1] + 2)) >> 8)
    inter_dir = np.where(
        cost_bi <= np.minimum(cost0, cost1), 3,
        np.where(cost0 <= cost1, 1, 2)).astype(np.int32)

    pred_y = np.where((inter_dir == 1)[:, None, None], pred0,
                      np.where((inter_dir == 2)[:, None, None], pred1,
                               pred_bi))
    lvl_y, rec_y, _, _ = _code_blocks(cur, pred_y, qp, 4, bd, lam_full)

    # chroma (8x8 per block); chroma MV = same quarter-pel ints (eighth-pel)
    cxs, cys = xs // 2, ys // 2
    out_c = {}
    for tag, plane, rp0, rp1 in (("u", ou, r0[1], r1[1]),
                                 ("v", ov, r0[2], r1[2])):
        cur_c = np.stack([plane[y : y + 8, x : x + 8]
                          for x, y in zip(cxs, cys)])
        c0_14 = mc_np14(rp0, cxs, cys, mvq0, 8, False, bd)
        c1_14 = mc_np14(rp1, cxs, cys, mvq1, 8, False, bd)
        c0 = mc_np(rp0, cxs, cys, mvq0, 8, False, bd)
        c1 = mc_np(rp1, cxs, cys, mvq1, 8, False, bd)
        cbi = bi_average_np(c0_14, c1_14, bd)
        pred_c = np.where((inter_dir == 1)[:, None, None], c0,
                          np.where((inter_dir == 2)[:, None, None], c1, cbi))
        lvl_c, rec_c, _, _ = _code_blocks(cur_c, pred_c, qpc, 3, bd,
                                          lam_full)
        out_c[tag] = (lvl_c, rec_c)

    return assemble_frame_b(cfg, dict(
        xs=xs, ys=ys, inter_dir=inter_dir, mvq0=mvq0, mvq1=mvq1,
        lvl_y=lvl_y, rec_y=rec_y, lvl_u=out_c["u"][0], rec_u=out_c["u"][1],
        lvl_v=out_c["v"][0], rec_v=out_c["v"][1]),
        l0_pocs, l1_pocs, cur_poc)


def assemble_frame_b(cfg, blocks, l0_pocs, l1_pocs, cur_poc):
    """Decode-order merge/skip/AMVP walk for B frames (16x16 CUs)."""
    from ..entropy.syntax import FrameSyntax

    sps = cfg.sps
    w, h = sps.coded_width, sps.coded_height
    fs = FrameSyntax(w, h)
    rec_y = np.zeros((h, w), np.int32)
    rec_u = np.zeros((h // 2, w // 2), np.int32)
    rec_v = np.zeros((h // 2, w // 2), np.int32)
    if cfg.pps.tiles_enabled or cfg.slice_ctus > 0:
        from .tiles import block_order_for

        order = block_order_for(sps, cfg.pps, slice_ctus=cfg.slice_ctus)
        fs.tile_order8 = order
        fs.tile_order4 = block_order_for(sps, cfg.pps, cell_log2=2,
                                         slice_ctus=cfg.slice_ctus)
    else:
        order = BlockOrder(w, h, sps.log2_ctu)
    field = MvFieldB(w // 8, h // 8)
    # relative pocs for the shared derivation (walk == decoder)
    l0_rel = [p - cur_poc for p in l0_pocs]
    l1_rel = [p - cur_poc for p in l1_pocs]
    list_pocs = [l0_rel, l1_rel]
    xs, ys = blocks["xs"], blocks["ys"]
    cells = sorted(range(len(xs)),
                   key=lambda i: order.order[ys[i] // 8, xs[i] // 8])
    mm = cfg.max_num_merge_cand
    if cfg.pps.tiles_enabled or cfg.slice_ctus > 0:
        from .tiles import seg_of_ctu, segment_spans

        seg_of = seg_of_ctu(sps, segment_spans(sps, cfg.pps,
                                               cfg.slice_ctus))
    else:
        seg_of = None
    cur_seg = 0
    for i in cells:
        x0, y0 = int(xs[i]), int(ys[i])
        if seg_of is not None:
            t = int(seg_of[(y0 >> sps.log2_ctu)
                           * sps.pic_width_in_ctus
                           + (x0 >> sps.log2_ctu)])
            if t != cur_seg:  # MV candidates never cross segments
                field = MvFieldB(w // 8, h // 8)
                cur_seg = t
        d = int(blocks["inter_dir"][i])
        mv0 = tuple(int(v) for v in blocks["mvq0"][i]) if d & 1 else (0, 0)
        mv1 = tuple(int(v) for v in blocks["mvq1"][i]) if d & 2 else (0, 0)
        ref0 = 0 if d & 1 else -1
        ref1 = 0 if d & 2 else -1
        cbf = bool(blocks["lvl_y"][i].any() or blocks["lvl_u"][i].any()
                   or blocks["lvl_v"][i].any())
        me = (d, mv0[0], mv0[1], ref0, mv1[0], mv1[1], ref1)
        cands = merge_candidates_b(field, order, x0, y0, 16, mm, 1, 1,
                                   l0_rel, l1_rel)
        merge_i = next((k for k, c in enumerate(cands) if c == me), -1)
        y8, x8 = y0 // 8, x0 // 8
        fs.cu_log2[y8 : y8 + 2, x8 : x8 + 2] = 4
        fs.inter_dir[y8 : y8 + 2, x8 : x8 + 2] = d
        fs.mv[y8 : y8 + 2, x8 : x8 + 2] = mv0
        fs.ref_idx[y8 : y8 + 2, x8 : x8 + 2] = max(ref0, 0)
        fs.mv_l1[y8 : y8 + 2, x8 : x8 + 2] = mv1
        fs.ref_idx_l1[y8 : y8 + 2, x8 : x8 + 2] = max(ref1, 0)
        if merge_i >= 0 and not cbf:
            fs.skip[y8 : y8 + 2, x8 : x8 + 2] = 1
            fs.merge_flag[y8 : y8 + 2, x8 : x8 + 2] = 1
            fs.merge_idx[y8 : y8 + 2, x8 : x8 + 2] = merge_i
        elif merge_i >= 0:
            fs.merge_flag[y8 : y8 + 2, x8 : x8 + 2] = 1
            fs.merge_idx[y8 : y8 + 2, x8 : x8 + 2] = merge_i
        else:
            for lx, mv, used in ((0, mv0, d & 1), (1, mv1, d & 2)):
                if not used:
                    continue
                ac = amvp_candidates_b(field, order, x0, y0, 16, lx, 0,
                                       list_pocs, 0)
                costs = [abs(mv[0] - c[0]) + abs(mv[1] - c[1]) for c in ac]
                mvp = int(np.argmin(costs))
                mvd = (mv[0] - ac[mvp][0], mv[1] - ac[mvp][1])
                if lx == 0:
                    fs.mvp_flag[y8 : y8 + 2, x8 : x8 + 2] = mvp
                    fs.mvd[y8 : y8 + 2, x8 : x8 + 2] = mvd
                else:
                    fs.mvp_flag_l1[y8 : y8 + 2, x8 : x8 + 2] = mvp
                    fs.mvd_l1[y8 : y8 + 2, x8 : x8 + 2] = mvd
        field.set_cu(x0, y0, 16, d, mv0, max(ref0, 0), mv1, max(ref1, 0))
        if cbf:
            fs.coeff_y[y0 : y0 + 16, x0 : x0 + 16] = blocks["lvl_y"][i]
            fs.coeff_cb[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8] = \
                blocks["lvl_u"][i]
            fs.coeff_cr[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8] = \
                blocks["lvl_v"][i]
        rec_y[y0 : y0 + 16, x0 : x0 + 16] = blocks["rec_y"][i]
        rec_u[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8] = \
            blocks["rec_u"][i]
        rec_v[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8] = \
            blocks["rec_v"][i]
    return fs, (rec_y, rec_u, rec_v)


def reconstruct_frame_b(fs, sps, qp: int, l0_refs, l1_refs):
    """Decoder-side B reconstruction. l0_refs/l1_refs: lists of (y,u,v)."""
    bd = sps.bit_depth
    w, h = fs.width, fs.height
    qpc = chroma_qp(qp)
    rec_y = np.zeros((h, w), np.int32)
    rec_u = np.zeros((h // 2, w // 2), np.int32)
    rec_v = np.zeros((h // 2, w // 2), np.int32)
    seen = np.zeros((h // 8, w // 8), dtype=bool)
    for y8 in range(h // 8):
        for x8 in range(w // 8):
            if seen[y8, x8]:
                continue
            log2 = int(fs.cu_log2[y8, x8])
            size = 1 << log2
            s8 = size // 8
            seen[y8 : y8 + s8, x8 : x8 + s8] = True
            x0, y0 = x8 * 8, y8 * 8
            d = int(fs.inter_dir[y8, x8])
            mv0 = fs.mv[y8, x8][None]
            mv1 = fs.mv_l1[y8, x8][None]
            r0 = l0_refs[min(int(fs.ref_idx[y8, x8]), len(l0_refs) - 1)] \
                if d & 1 else None
            r1 = l1_refs[min(int(fs.ref_idx_l1[y8, x8]), len(l1_refs) - 1)] \
                if d & 2 else None
            planes = ((rec_y, 0, fs.coeff_y, qp, size, log2, True),
                      (rec_u, 1, fs.coeff_cb, qpc, size // 2, log2 - 1, False),
                      (rec_v, 2, fs.coeff_cr, qpc, size // 2, log2 - 1, False))
            for out, ci, coeff, q, s, lg, lum in planes:
                px = (x0 if lum else x0 // 2)
                py = (y0 if lum else y0 // 2)
                if d == 3:
                    a = mc_np14(r0[ci], np.array([px]), np.array([py]),
                                mv0, s, lum, bd)[0]
                    b = mc_np14(r1[ci], np.array([px]), np.array([py]),
                                mv1, s, lum, bd)[0]
                    pred = bi_average_np(a[None], b[None], bd)[0]
                else:
                    rr, mv = (r0, mv0) if d == 1 else (r1, mv1)
                    pred = mc_np(rr[ci], np.array([px]), np.array([py]),
                                 mv, s, lum, bd)[0]
                blk = coeff[py : py + s, px : px + s]
                if blk.any():
                    dq = tx.dequantize_np(blk[None], q, lg, bd)
                    r = tx.inverse_transform_np(dq, bd)[0]
                    pred = np.clip(pred + r, 0, (1 << bd) - 1)
                out[py : py + s, px : px + s] = pred
    return rec_y, rec_u, rec_v
