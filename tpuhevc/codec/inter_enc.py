"""P-frame encoding: batched ME + NN-FME subpel + MC + residual, then a
decode-order decision walk for merge/skip/AMVP syntax.

Counterpart of the reference's TEncSearch::predInterSearch /
xMotionEstimation path (SURVEY.md §3.3) restructured TPU-first:

- integer ME: dense SAD maps for every PU at once (ops/me.py) instead of
  the sequential TZ search;
- fractional ME: the per-QP NN-FME MLP batched over all PUs (fme="nn",
  reproducing NN_pred TEncSearch.cpp:85-204), or integer-only
  (fme="none"). The reference's discarded-FracDIF quirk (TEncSearch.cpp
  4534 vs 4586) is deliberately NOT reproduced: we never compute what we
  throw away. A DCT-IF SATD refinement ("dctif") is the A/B comparison arm.
- MC + transform + quant + recon: batched per CU-size class (inter has no
  intra-frame recon dependency);
- merge/skip/AMVP decisions: a host walk in decode order sharing
  codec/mv.py derivation with the decoder.

v1 structure: 2Nx2N CUs, 16x16 where aligned (8x8 at partial borders),
TU = CU, single reference (previous frame), all-inter P frames.
"""

from __future__ import annotations

import numpy as np

from ..ops import me as me_ops
from ..ops import transforms as tx
from ..ops.interp import mc_np
from ..utils.tables import chroma_qp, qp_to_lambda
from .mv import MvField, amvp_candidates, merge_candidates
from .params import EncoderConfig
from .recon import _pad_to
from .refsamples import BlockOrder


def _cu_grid(w: int, h: int):
    """(positions16, positions8): 16x16 CUs where aligned+inside, 8x8 rest."""
    pos16, pos8 = [], []
    for y0 in range(0, h, 8):
        for x0 in range(0, w, 8):
            ax, ay = x0 - x0 % 16, y0 - y0 % 16
            if ax + 16 <= w and ay + 16 <= h:
                if x0 == ax and y0 == ay:
                    pos16.append((x0, y0))
            else:
                pos8.append((x0, y0))
    return pos16, pos8


def _subpel_mvs(cfg: EncoderConfig, mv_int, sad9, size, nn_params):
    """Integer MV (full-pel) -> final quarter-pel MV per fme mode."""
    mvq = mv_int.astype(np.int32) * 4
    mode = cfg.fme_mode
    if mode == "none" or nn_params is None and mode == "nn":
        return mvq
    if mode == "nn":
        from ..models import nnfme

        n = len(mv_int)
        off = nnfme.predict_np(
            nn_params, sad9.astype(np.float32),
            np.full(n, size), np.full(n, size))
        return mvq + off.astype(np.int32)
    raise ValueError(f"fme mode {mode}")


def _compute_stage_np(cfg, orig, ref, pos16, pos8, nn_params, lambda_fp,
                      collect_sads=False):
    """Batched ME + subpel + MC + transform/quant/recon per CU-size class.
    Returns {(x0, y0): per-CU dict}. Host numpy reference; the JAX stage
    (_compute_stage_jax) must match it exactly."""
    sps, qp = cfg.sps, cfg.qp
    bd = sps.bit_depth
    oy, ou, ov = orig
    ry, ru, rv = ref
    qpc = chroma_qp(qp)
    per_cu = {}
    for size, poss in ((16, pos16), (8, pos8)):
        if not poss:
            continue
        xs = np.array([p[0] for p in poss])
        ys = np.array([p[1] for p in poss])
        cur = np.stack([oy[y0 : y0 + size, x0 : x0 + size] for x0, y0 in poss])
        sr = min(cfg.search_range, 16)
        mv_int, sad_map, best = me_ops.integer_me_np(ry, cur, xs, ys, sr,
                                                     lambda_fp)
        sad9 = me_ops.sad_surface_np(sad_map, best)
        mvq = _subpel_mvs(cfg, mv_int, sad9, size, nn_params)
        # MC + residual (batched per class)
        pred = mc_np(ry, xs, ys, mvq, size, True, bd)
        resi = cur.astype(np.int32) - pred
        log2 = size.bit_length() - 1
        coef = tx.forward_transform_np(resi, bd)
        lvl = tx.quantize_np(coef, qp, log2, bd, is_intra_slice=False)
        deq = tx.dequantize_np(lvl, qp, log2, bd)
        rsd = tx.inverse_transform_np(deq, bd)
        recon = np.clip(pred + rsd, 0, (1 << bd) - 1)
        nz = lvl.reshape(len(poss), -1).any(axis=1)
        recon = np.where(nz[:, None, None], recon, pred)
        # chroma
        cs = size // 2
        cxs, cys = xs // 2, ys // 2
        cur_u = np.stack([ou[y : y + cs, x : x + cs] for x, y in zip(cxs, cys)])
        cur_v = np.stack([ov[y : y + cs, x : x + cs] for x, y in zip(cxs, cys)])
        pred_u = mc_np(ru, cxs, cys, mvq, cs, False, bd)
        pred_v = mc_np(rv, cxs, cys, mvq, cs, False, bd)
        clog2 = cs.bit_length() - 1
        out_c = []
        for cur_c, pred_c in ((cur_u, pred_u), (cur_v, pred_v)):
            cc = tx.forward_transform_np(cur_c.astype(np.int32) - pred_c, bd)
            clvl = tx.quantize_np(cc, qpc, clog2, bd, is_intra_slice=False)
            cdq = tx.dequantize_np(clvl, qpc, clog2, bd)
            crs = tx.inverse_transform_np(cdq, bd)
            crec = np.clip(pred_c + crs, 0, (1 << bd) - 1)
            cnz = clvl.reshape(len(poss), -1).any(axis=1)
            crec = np.where(cnz[:, None, None], crec, pred_c)
            out_c.append((clvl, crec))
        for i, (x0, y0) in enumerate(poss):
            per_cu[(x0, y0)] = dict(
                size=size, mv=mvq[i], lvl=lvl[i], rec=recon[i],
                lvl_u=out_c[0][0][i], rec_u=out_c[0][1][i],
                lvl_v=out_c[1][0][i], rec_v=out_c[1][1][i],
            )
            if collect_sads:
                per_cu[(x0, y0)]["sad9"] = sad9[i]
                per_cu[(x0, y0)]["mv_int"] = mv_int[i]
    return per_cu


_JAX_STAGE_CACHE: dict = {}


def _stage_fn(cfg, classes, nn_params, lambda_fp):
    """Build (and cache) the jitted P-frame compute stage.

    Returns fn(oy, ou, ov, ry, ru, rv) ->
      (packed_uint8, rec_y, rec_u, rec_v)   [all device arrays]
    The recon planes stay on device so consecutive P frames chain without a
    host round trip; the packed buffer is a compact fetch (uint8 recon,
    int16 coefficients, int32 meta, byte-cast)."""
    import jax
    import jax.numpy as jnp

    from ..models import nnfme
    from ..ops.interp import mc as mc_jax
    from ..ops.me import integer_me as me_jax

    sps, qp = cfg.sps, cfg.qp
    bd = sps.bit_depth
    w, h = sps.coded_width, sps.coded_height
    qpc = chroma_qp(qp)
    sr = min(cfg.search_range, 16)
    key = (cfg.fme_mode, qp, bd, sr, lambda_fp, w, h,
           tuple((s, len(p)) for s, p in classes),
           cfg.nn_weights_dir if nn_params is not None else None)
    fn = _JAX_STAGE_CACHE.get(key)
    if fn is not None:
        return fn
    np_params = (
        {k: jnp.asarray(v) for k, v in nn_params.items()}
        if (nn_params is not None and cfg.fme_mode == "nn") else None
    )
    class_pos = [(s, np.array([q[0] for q in p]), np.array([q[1] for q in p]))
                 for s, p in classes]

    def u8(x):
        return jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(-1)

    def run(oy, ou, ov, ry, ru, rv):
        outs = []
        rec_y = jnp.zeros(h * w, jnp.int32)
        rec_u = jnp.zeros(h * w // 4, jnp.int32)
        rec_v = jnp.zeros(h * w // 4, jnp.int32)
        for size, xs_np, ys_np in class_pos:
            xs = jnp.asarray(xs_np)
            ys = jnp.asarray(ys_np)
            n = len(xs_np)
            cur = jnp.stack([
                jax.lax.dynamic_slice(oy, (int(y), int(x)), (size, size))
                for x, y in zip(xs_np, ys_np)])
            mv_int, sad9 = me_jax(ry, cur, xs, ys, sr, lambda_fp)
            mvq = mv_int * 4
            if np_params is not None:
                off = nnfme.predict(
                    np_params, sad9.astype(jnp.float32),
                    jnp.full(n, nnfme.height_category(size)),
                    jnp.full(n, nnfme.width_category(size)))
                mvq = mvq + off.astype(jnp.int32)
            pred = mc_jax(ry, xs, ys, mvq, size, True, bd)
            log2 = size.bit_length() - 1
            coef = tx.forward_transform(cur.astype(jnp.int32) - pred, bd)
            lvl = tx.quantize(coef, qp, log2, bd, is_intra_slice=False)
            deq = tx.dequantize(lvl, qp, log2, bd)
            rsd = tx.inverse_transform(deq, bd)
            rec = jnp.clip(pred + rsd, 0, (1 << bd) - 1)
            nz = (lvl != 0).any(axis=(-1, -2))
            rec = jnp.where(nz[:, None, None], rec, pred)
            yidx = np.concatenate([
                ((ys_np[i] + np.arange(size))[:, None] * w
                 + xs_np[i] + np.arange(size)[None, :]).reshape(-1)
                for i in range(n)])
            rec_y = rec_y.at[jnp.asarray(yidx)].set(rec.reshape(-1))
            chunk = [u8(mvq), u8(sad9.astype(jnp.int32)), u8(mv_int),
                     u8(lvl.astype(jnp.int16)), rec.astype(jnp.uint8).reshape(-1)]
            cs = size // 2
            clog2 = cs.bit_length() - 1
            cw = w // 2
            cxs, cys = xs // 2, ys // 2
            for ci, (plane, refp) in enumerate(((ou, ru), (ov, rv))):
                cur_c = jnp.stack([
                    jax.lax.dynamic_slice(plane, (int(y) // 2, int(x) // 2),
                                          (cs, cs))
                    for x, y in zip(xs_np, ys_np)])
                pred_c = mc_jax(refp, cxs, cys, mvq, cs, False, bd)
                cc = tx.forward_transform(cur_c.astype(jnp.int32) - pred_c, bd)
                clvl = tx.quantize(cc, qpc, clog2, bd, is_intra_slice=False)
                cdq = tx.dequantize(clvl, qpc, clog2, bd)
                crs = tx.inverse_transform(cdq, bd)
                crec = jnp.clip(pred_c + crs, 0, (1 << bd) - 1)
                cnz = (clvl != 0).any(axis=(-1, -2))
                crec = jnp.where(cnz[:, None, None], crec, pred_c)
                cidx = np.concatenate([
                    (((ys_np[i] // 2) + np.arange(cs))[:, None] * cw
                     + (xs_np[i] // 2) + np.arange(cs)[None, :]).reshape(-1)
                    for i in range(n)])
                if ci == 0:
                    rec_u = rec_u.at[jnp.asarray(cidx)].set(crec.reshape(-1))
                else:
                    rec_v = rec_v.at[jnp.asarray(cidx)].set(crec.reshape(-1))
                chunk += [u8(clvl.astype(jnp.int16)),
                          crec.astype(jnp.uint8).reshape(-1)]
            outs.append(jnp.concatenate(chunk))
        return (jnp.concatenate(outs), rec_y.reshape(h, w),
                rec_u.reshape(h // 2, w // 2), rec_v.reshape(h // 2, w // 2))

    fn = jax.jit(run)
    _JAX_STAGE_CACHE[key] = fn
    return fn


def _stage_collect(buf: np.ndarray, classes) -> dict:
    """Unpack the fetched uint8 buffer into the per-CU dict."""
    per_cu = {}
    off = 0

    def take_bytes(nbytes, dtype, shape):
        nonlocal off
        out = np.frombuffer(buf[off : off + nbytes].tobytes(), dtype=dtype)
        off += nbytes
        return out.reshape(shape)

    for size, poss in classes:
        n = len(poss)
        cs = size // 2
        mvq = take_bytes(n * 8, np.int32, (n, 2))
        sad9 = take_bytes(n * 36, np.int32, (n, 9))
        mv_int = take_bytes(n * 8, np.int32, (n, 2))
        lvl = take_bytes(n * size * size * 2, np.int16, (n, size, size))
        rec = take_bytes(n * size * size, np.uint8, (n, size, size))
        lvl_u = take_bytes(n * cs * cs * 2, np.int16, (n, cs, cs))
        rec_u = take_bytes(n * cs * cs, np.uint8, (n, cs, cs))
        lvl_v = take_bytes(n * cs * cs * 2, np.int16, (n, cs, cs))
        rec_v = take_bytes(n * cs * cs, np.uint8, (n, cs, cs))
        for i, (x0, y0) in enumerate(poss):
            per_cu[(x0, y0)] = dict(
                size=size, mv=mvq[i], lvl=lvl[i].astype(np.int32),
                rec=rec[i].astype(np.int32),
                lvl_u=lvl_u[i].astype(np.int32), rec_u=rec_u[i].astype(np.int32),
                lvl_v=lvl_v[i].astype(np.int32), rec_v=rec_v[i].astype(np.int32),
                sad9=sad9[i], mv_int=mv_int[i],
            )
    return per_cu


def _compute_stage_jax(cfg, orig, ref, pos16, pos8, nn_params, lambda_fp):
    """Synchronous device stage (submit + fetch). encode_sequence's LD-P
    pipeline uses _stage_fn directly to overlap device/host work."""
    import jax.numpy as jnp

    classes = [(s, p) for s, p in ((16, pos16), (8, pos8)) if p]
    fn = _stage_fn(cfg, classes, nn_params, lambda_fp)
    oy, ou, ov = (jnp.asarray(a) for a in orig)
    ry, ru, rv = (jnp.asarray(a) for a in ref)
    buf, _, _, _ = fn(oy, ou, ov, ry, ru, rv)
    return _stage_collect(np.asarray(buf), classes)


def encode_frame_p(orig, ref_recon, cfg: EncoderConfig, nn_params=None,
                   backend: str = "np"):
    """orig: (y, u, v) arrays; ref_recon: previous frame's recon planes.
    Returns (FrameSyntax, recon)."""
    from ..entropy.syntax import FrameSyntax

    sps, qp = cfg.sps, cfg.qp
    bd = sps.bit_depth
    w, h = sps.coded_width, sps.coded_height
    oy = _pad_to(np.asarray(orig[0]), h, w)
    ou = _pad_to(np.asarray(orig[1]), h // 2, w // 2)
    ov = _pad_to(np.asarray(orig[2]), h // 2, w // 2)
    ry, ru, rv = (p.astype(np.int32) for p in ref_recon)
    lambda_fp = int(round(np.sqrt(qp_to_lambda(qp, 0.4624)) * 256))
    pos16, pos8 = _cu_grid(w, h)
    stage = _compute_stage_jax if backend == "jax" else _compute_stage_np
    per_cu = stage(
        cfg, (oy, ou, ov), (ry, ru, rv), pos16, pos8, nn_params, lambda_fp)
    return assemble_frame_p(cfg, per_cu)


def assemble_frame_p(cfg: EncoderConfig, per_cu: dict):
    """Decode-order decision walk (merge/skip/AMVP) + dense-array assembly.
    Shared by the synchronous path and the pipelined LD-P loop."""
    from ..entropy.syntax import FrameSyntax

    sps = cfg.sps
    w, h = sps.coded_width, sps.coded_height
    fs = FrameSyntax(w, h)
    rec_y = np.zeros((h, w), dtype=np.int32)
    rec_u = np.zeros((h // 2, w // 2), dtype=np.int32)
    rec_v = np.zeros((h // 2, w // 2), dtype=np.int32)
    order = BlockOrder(w, h, sps.log2_ctu)
    field = MvField(w // 8, h // 8)

    # --- decision walk in decode order (merge/skip/AMVP + store) ---------
    cells = sorted(per_cu.keys(), key=lambda p: order.order[p[1] // 8, p[0] // 8])
    h8w8 = fs.cu_log2
    for x0, y0 in cells:
        cu = per_cu[(x0, y0)]
        size = cu["size"]
        log2 = size.bit_length() - 1
        mv = tuple(int(v) for v in cu["mv"])
        cbf = bool(cu["lvl"].any() or cu["lvl_u"].any() or cu["lvl_v"].any())
        mcands = merge_candidates(field, order, x0, y0, size, cfg.max_num_merge_cand)
        merge_i = next((k for k, c in enumerate(mcands) if c == mv), -1)
        y8, x8 = y0 // 8, x0 // 8
        s8 = size // 8
        fs.cu_log2[y8 : y8 + s8, x8 : x8 + s8] = log2
        fs.mv[y8 : y8 + s8, x8 : x8 + s8] = mv
        if merge_i >= 0 and not cbf:
            fs.skip[y8 : y8 + s8, x8 : x8 + s8] = 1
            fs.merge_flag[y8 : y8 + s8, x8 : x8 + s8] = 1
            fs.merge_idx[y8 : y8 + s8, x8 : x8 + s8] = merge_i
        elif merge_i >= 0:
            fs.merge_flag[y8 : y8 + s8, x8 : x8 + s8] = 1
            fs.merge_idx[y8 : y8 + s8, x8 : x8 + s8] = merge_i
        else:
            acands = amvp_candidates(field, order, x0, y0, size)
            costs = [abs(mv[0] - c[0]) + abs(mv[1] - c[1]) for c in acands]
            mvp = int(np.argmin(costs))
            fs.mvp_flag[y8 : y8 + s8, x8 : x8 + s8] = mvp
            fs.mvd[y8 : y8 + s8, x8 : x8 + s8] = (
                mv[0] - acands[mvp][0], mv[1] - acands[mvp][1])
        field.set_cu(x0, y0, size, mv)
        # store coeffs + recon
        if cbf:
            fs.coeff_y[y0 : y0 + size, x0 : x0 + size] = cu["lvl"]
            cs = size // 2
            fs.coeff_cb[y0 // 2 : y0 // 2 + cs, x0 // 2 : x0 // 2 + cs] = cu["lvl_u"]
            fs.coeff_cr[y0 // 2 : y0 // 2 + cs, x0 // 2 : x0 // 2 + cs] = cu["lvl_v"]
        rec_y[y0 : y0 + size, x0 : x0 + size] = cu["rec"]
        cs = size // 2
        rec_u[y0 // 2 : y0 // 2 + cs, x0 // 2 : x0 // 2 + cs] = cu["rec_u"]
        rec_v[y0 // 2 : y0 // 2 + cs, x0 // 2 : x0 // 2 + cs] = cu["rec_v"]
    return fs, (rec_y, rec_u, rec_v)


def reconstruct_frame_p(fs, sps, qp: int, ref_recon):
    """Decoder-side P-frame reconstruction from parsed FrameSyntax.
    Invariant: TU = CU (what this framework's encoder emits)."""
    bd = sps.bit_depth
    w, h = fs.width, fs.height
    ry, ru, rv = (p.astype(np.int32) for p in ref_recon)
    qpc = chroma_qp(qp)
    rec_y = np.zeros((h, w), dtype=np.int32)
    rec_u = np.zeros((h // 2, w // 2), dtype=np.int32)
    rec_v = np.zeros((h // 2, w // 2), dtype=np.int32)
    # gather CUs from the maps
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
            mv = fs.mv[y8, x8][None]
            pred = mc_np(ry, np.array([x0]), np.array([y0]), mv, size, True, bd)[0]
            blk = fs.coeff_y[y0 : y0 + size, x0 : x0 + size]
            if blk.any():
                d = tx.dequantize_np(blk[None], qp, log2, bd)[0]
                r = tx.inverse_transform_np(d[None], bd)[0]
                pred = np.clip(pred + r, 0, (1 << bd) - 1)
            rec_y[y0 : y0 + size, x0 : x0 + size] = pred
            cs = size // 2
            clog2 = log2 - 1
            for plane, refp, coeff, qpcc in (
                (rec_u, ru, fs.coeff_cb, qpc), (rec_v, rv, fs.coeff_cr, qpc)
            ):
                cx, cy = x0 // 2, y0 // 2
                cpred = mc_np(refp, np.array([cx]), np.array([cy]), mv, cs,
                              False, bd)[0]
                cblk = coeff[cy : cy + cs, cx : cx + cs]
                if cblk.any():
                    cd = tx.dequantize_np(cblk[None], qpcc, clog2, bd)[0]
                    crr = tx.inverse_transform_np(cd[None], bd)[0]
                    cpred = np.clip(cpred + crr, 0, (1 << bd) - 1)
                plane[cy : cy + cs, cx : cx + cs] = cpred
    return rec_y, rec_u, rec_v
