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




def _bits_est_np(lvl):
    """Integer residual-bit proxy: sum over nonzero coeffs of
    2*bit_length(|l|) + 1 (exactly reproducible on device)."""
    a = np.abs(lvl.reshape(lvl.shape[0], -1))
    bl = np.zeros_like(a)
    for k in range(15):
        bl += (a > (1 << k) - 1).astype(a.dtype)  # a >= 2^k
    return (2 * bl + (a > 0)).sum(axis=1).astype(np.int64)


def _bits_est_jnp(lvl):
    import jax.numpy as jnp

    a = jnp.abs(lvl.reshape(lvl.shape[0], -1))
    bl = jnp.zeros_like(a)
    for k in range(15):
        bl = bl + (a > (1 << k) - 1).astype(a.dtype)
    return (2 * bl + (a > 0)).sum(axis=1)


def _full_lambda_fp(cfg) -> int:
    """Picture lambda in 8.8 fixed point (full, not sqrt). Uses the
    encoder-set per-frame lambda (HM model incl. hierarchy multiplier,
    params.p_frame_lambda) when present."""
    lam = cfg.frame_lambda or qp_to_lambda(cfg.qp, 0.4624)
    return int(round(lam * 256))

def _grid_hier(w: int, h: int):
    """Hierarchical CU grid: aligned 32-regions (each with its 4 16-sub-CUs,
    RD-selected), free 16s, and 8s at non-16-aligned borders."""
    pos16_all, pos8 = _cu_grid(w, h)
    pos32 = [(x, y) for (x, y) in pos16_all
             if x % 32 == 0 and y % 32 == 0 and x + 32 <= w and y + 32 <= h]
    covered = set()
    sub16 = []
    for x, y in pos32:
        for dy in (0, 16):
            for dx in (0, 16):
                covered.add((x + dx, y + dy))
                sub16.append((x + dx, y + dy))
    pos16_free = [p for p in pos16_all if p not in covered]
    return pos32, sub16, pos16_free, pos8


_OVH_BITS = 16  # flat per-CU syntax overhead estimate for the size choice


def _np_me(ref, cur, xs, ys, sr, lambda_fp):
    mv, sad_map, best = me_ops.integer_me_np(ref, cur, xs, ys, sr, lambda_fp)
    return mv, me_ops.sad_surface_np(sad_map, best)



def _per_qp(op, arr, qpv, *rest):
    """Apply op(batch, qp, *rest) grouped by distinct per-block QP values
    (cu_qp_delta streams: blocks of one CTU share a QP, QPs vary across
    CTUs within the clip window, so the group count stays tiny)."""
    out = None
    for v in np.unique(qpv):
        m = qpv == v
        r = op(arr[m], int(v), *rest)
        if out is None:
            out = np.empty((len(qpv),) + r.shape[1:], r.dtype)
        out[m] = r
    return out


def _class_pipeline(F, cfg, orig, ref, size, xs_np, ys_np, nn_params,
                    lambda_fp):
    """ME + FME + MC + transform/quant + skip-bias for one CU-size class.
    F: backend dict (numpy or jax twins). Returns dict of batched arrays."""
    xp = F["xp"]
    sps, qp = cfg.sps, cfg.qp
    bd = sps.bit_depth
    qpc = chroma_qp(qp)
    qp_map = getattr(cfg, "ctu_qp_map", None)
    qpv = qpcv = None
    if qp_map is not None and F["xp"] is np:
        l2c = sps.log2_ctu
        qp_map = np.asarray(qp_map)
        qpv = qp_map[np.asarray(ys_np) >> l2c,
                     np.asarray(xs_np) >> l2c].astype(np.int32)
        qpcv = np.array([chroma_qp(int(v)) for v in qpv], np.int32)
    sr = min(cfg.search_range, 16)
    lam = _full_lambda_fp(cfg)
    oy, ou, ov = orig
    ry, ru, rv = ref
    n = len(xs_np)
    xs = xp.asarray(xs_np)
    ys = xp.asarray(ys_np)
    sbh = cfg.pps.sign_data_hiding and F["xp"] is np
    cur = xp.stack([oy[int(y) : int(y) + size, int(x) : int(x) + size]
                    for x, y in zip(xs_np, ys_np)])
    mv_int, sad9 = F["me"](ry, cur, xs, ys, sr, lambda_fp)
    mvq = mv_int * 4
    if cfg.fme_mode == "dctif" and F["xp"] is np:
        from ..ops.me import fracdif_refine_np

        mvq = fracdif_refine_np(ry, np.asarray(cur), xs_np, ys_np,
                                np.asarray(mv_int), lambda_fp, bd)
    if nn_params is not None and cfg.fme_mode == "nn":
        from ..models import nnfme

        hc = int(nnfme.height_category(size))
        wc = int(nnfme.width_category(size))
        off = F["nn"](nn_params, sad9, xp.full(n, hc), xp.full(n, wc))
        mvq = mvq + off.astype(xp.int32)
    pred = F["mc"](ry, xs, ys, mvq, size, True, bd)
    log2 = size.bit_length() - 1
    coef = F["fwd"](cur.astype(xp.int32) - pred, bd)
    if qpv is not None:
        if cfg.rdoq:
            lvl = _per_qp(lambda a, q: tx.rdoq_np(a, q, log2, bd, lam),
                          np.asarray(coef), qpv)
        else:
            lvl = _per_qp(lambda a, q: F["quant"](a, q, log2, bd, False),
                          coef, qpv)
        if sbh:
            from ..entropy.residual import SCAN_DIAG, apply_sign_bit_hiding

            lvl = apply_sign_bit_hiding(
                lvl, log2, SCAN_DIAG,
                _per_qp(lambda a, q: tx.ideal_levels_np(a, q, log2, bd),
                        np.asarray(coef), qpv))
        rsd = F["inv"](_per_qp(lambda a, q: F["deq"](a, q, log2, bd),
                               lvl, qpv), bd)
    elif cfg.rdoq and F["xp"] is np:
        lvl = tx.rdoq_np(np.asarray(coef), qp, log2, bd, lam)
        if sbh:
            from ..entropy.residual import SCAN_DIAG, apply_sign_bit_hiding

            lvl = apply_sign_bit_hiding(
                lvl, log2, SCAN_DIAG,
                tx.ideal_levels_np(coef, qp, log2, bd))
        rsd = F["inv"](F["deq"](lvl, qp, log2, bd), bd)
    else:
        lvl = F["quant"](coef, qp, log2, bd, False)
        if sbh:
            from ..entropy.residual import SCAN_DIAG, apply_sign_bit_hiding

            lvl = apply_sign_bit_hiding(
                lvl, log2, SCAN_DIAG,
                tx.ideal_levels_np(coef, qp, log2, bd))
        rsd = F["inv"](F["deq"](lvl, qp, log2, bd), bd)
    rec = xp.clip(pred + rsd, 0, (1 << bd) - 1)
    nz = (lvl != 0).reshape(n, -1).any(axis=1)
    rec = xp.where(nz[:, None, None], rec, pred)
    d_skip = ((cur.astype(xp.int32) - pred) ** 2).reshape(n, -1).astype(xp.int64).sum(axis=1)
    d_coded = ((cur.astype(xp.int32) - rec) ** 2).reshape(n, -1).astype(xp.int64).sum(axis=1)
    # int32-safe: shift the lambda side instead of scaling distortion
    drop = (d_skip - d_coded) <= (lam * F["bits"](lvl).astype(xp.int64)) >> 8
    lvl = xp.where(drop[:, None, None], 0, lvl)
    rec = xp.where(drop[:, None, None], pred, rec)
    d_total = xp.where(drop, d_skip, d_coded)
    bits_total = F["bits"](lvl).astype(xp.int64)

    out = dict(mvq=mvq, sad9=sad9, mv_int=mv_int, lvl=lvl, rec=rec)
    cs = size // 2
    clog2 = cs.bit_length() - 1
    cxs, cys = xs // 2, ys // 2
    for tag, plane, refp in (("u", ou, ru), ("v", ov, rv)):
        cur_c = xp.stack([
            plane[int(y) // 2 : int(y) // 2 + cs, int(x) // 2 : int(x) // 2 + cs]
            for x, y in zip(xs_np, ys_np)])
        pred_c = F["mc"](refp, cxs, cys, mvq, cs, False, bd)
        cc = F["fwd"](cur_c.astype(xp.int32) - pred_c, bd)
        if qpcv is not None:
            if cfg.rdoq:
                clvl = _per_qp(lambda a, q: tx.rdoq_np(a, q, clog2, bd,
                                                       lam),
                               np.asarray(cc), qpcv)
            else:
                clvl = _per_qp(
                    lambda a, q: F["quant"](a, q, clog2, bd, False),
                    cc, qpcv)
        elif cfg.rdoq and F["xp"] is np:
            clvl = tx.rdoq_np(np.asarray(cc), qpc, clog2, bd, lam)
        else:
            clvl = F["quant"](cc, qpc, clog2, bd, False)
        if sbh:
            from ..entropy.residual import SCAN_DIAG, apply_sign_bit_hiding

            ideal = (tx.ideal_levels_np(cc, qpc, clog2, bd)
                     if qpcv is None else
                     _per_qp(lambda a, q: tx.ideal_levels_np(a, q, clog2,
                                                             bd),
                             np.asarray(cc), qpcv))
            clvl = apply_sign_bit_hiding(clvl, clog2, SCAN_DIAG, ideal)
        crs = F["inv"]((F["deq"](clvl, qpc, clog2, bd) if qpcv is None
                        else _per_qp(lambda a, q: F["deq"](a, q, clog2,
                                                           bd),
                                     clvl, qpcv)), bd)
        crec = xp.clip(pred_c + crs, 0, (1 << bd) - 1)
        cnz = (clvl != 0).reshape(n, -1).any(axis=1)
        crec = xp.where(cnz[:, None, None], crec, pred_c)
        dc_s = ((cur_c.astype(xp.int32) - pred_c) ** 2).reshape(n, -1).astype(xp.int64).sum(axis=1)
        dc_c = ((cur_c.astype(xp.int32) - crec) ** 2).reshape(n, -1).astype(xp.int64).sum(axis=1)
        cdrop = (dc_s - dc_c) <= (lam * F["bits"](clvl).astype(xp.int64)) >> 8
        clvl = xp.where(cdrop[:, None, None], 0, clvl)
        crec = xp.where(cdrop[:, None, None], pred_c, crec)
        d_total = d_total + xp.where(cdrop, dc_s, dc_c)
        bits_total = bits_total + F["bits"](clvl).astype(xp.int64)
        out["lvl_" + tag] = clvl
        out["rec_" + tag] = crec
    out["d"] = d_total
    out["bits"] = bits_total
    return out


def _np_backend():
    import numpy as xp

    def nn_np(params, sad9, hcat, wcat):
        # forward with categories already resolved (nnfme.forward_np takes
        # raw sizes; this mirrors it exactly)
        p = {k: np.asarray(v) for k, v in params.items()}
        x = (np.asarray(sad9, np.float32) - p["mean"]) / p["std"] * p["bn_in"]
        e0 = p["emb0"][np.asarray(hcat)]
        e1 = p["emb1"][np.asarray(wcat)]
        inp = np.concatenate([e0, e1, x], axis=-1)
        h1 = np.maximum(inp @ p["w1"].T + p["b1"], 0) * p["bn1_w"] + p["bn1_b"]
        h2 = np.maximum(h1 @ p["w2"].T + p["b2"], 0) * p["bn2_w"] + p["bn2_b"]
        cls = np.argmax(h2 @ p["wout"].T + p["bout"], axis=-1)
        from ..models.nnfme import CLASS_TO_QMV

        return CLASS_TO_QMV[cls]

    return dict(
        xp=xp, me=_np_me, mc=mc_np, nn=nn_np,
        fwd=tx.forward_transform_np, quant=tx.quantize_np,
        deq=tx.dequantize_np, inv=tx.inverse_transform_np,
        bits=_bits_est_np,
    )


def _jax_backend():
    import jax.numpy as xp

    from ..models import nnfme
    from ..ops.interp import mc as mc_jax
    from ..ops.me import integer_me as me_jax

    def nn_jax(params, sad9, hcat, wcat):
        p = {k: xp.asarray(v) for k, v in params.items()}
        logits = nnfme.forward(p, sad9.astype(xp.float32), hcat, wcat)
        return xp.asarray(nnfme.CLASS_TO_QMV)[xp.argmax(logits, axis=-1)]

    return dict(
        xp=xp, me=me_jax, mc=mc_jax, nn=nn_jax,
        fwd=tx.forward_transform, quant=tx.quantize,
        deq=tx.dequantize, inv=tx.inverse_transform,
        bits=_bits_est_jnp,
    )


def _choose32(c32, c16, lam):
    """Integer RD choice per 32-region. c16 arrays ordered 4 subs/region
    (TL, TR, BL, BR)."""
    xp = np if isinstance(c32["d"], np.ndarray) else None
    d16 = c16["d"].reshape(-1, 4)
    b16 = c16["bits"].reshape(-1, 4)
    cost16 = (d16 + ((lam * (b16 + _OVH_BITS)) >> 8)).sum(axis=1)
    cost32 = c32["d"] + ((lam * (c32["bits"] + _OVH_BITS)) >> 8)
    return cost32 <= cost16


def _build_per_cu(cfg, grids, arrs, use32) -> dict:
    """Assemble the per-CU dict from per-class arrays + the 32-choice."""
    pos32, sub16, pos16_free, pos8 = grids
    per_cu = {}

    def emit(poss, a, mask=None):
        for i, (x0, y0) in enumerate(poss):
            if mask is not None and not mask[i]:
                continue
            per_cu[(x0, y0)] = dict(
                size=a["size"], mv=np.asarray(a["mvq"][i]),
                lvl=np.asarray(a["lvl"][i], dtype=np.int32),
                rec=np.asarray(a["rec"][i], dtype=np.int32),
                lvl_u=np.asarray(a["lvl_u"][i], dtype=np.int32),
                rec_u=np.asarray(a["rec_u"][i], dtype=np.int32),
                lvl_v=np.asarray(a["lvl_v"][i], dtype=np.int32),
                rec_v=np.asarray(a["rec_v"][i], dtype=np.int32),
                sad9=np.asarray(a["sad9"][i]), mv_int=np.asarray(a["mv_int"][i]),
            )

    if pos32:
        m32 = np.asarray(use32)
        emit(pos32, arrs["c32"], m32)
        m16 = np.repeat(~m32, 4)
        emit(sub16, arrs["c16"], m16)
    if pos16_free:
        emit(pos16_free, arrs["cf"])
    if pos8:
        emit(pos8, arrs["c8"])
    return per_cu


def _compute_stage_np(cfg, orig, ref, nn_params, lambda_fp):
    """Host reference stage (hierarchical 32/16 + borders)."""
    sps = cfg.sps
    w, h = sps.coded_width, sps.coded_height
    F = _np_backend()
    grids = _grid_hier(w, h)
    pos32, sub16, pos16_free, pos8 = grids
    orig = tuple(np.asarray(p, dtype=np.int32) for p in orig)
    ref = tuple(np.asarray(p, dtype=np.int32) for p in ref)
    arrs = {}
    use32 = None
    lam = _full_lambda_fp(cfg)

    def run(poss, size):
        xs = np.array([p[0] for p in poss])
        ys = np.array([p[1] for p in poss])
        out = _class_pipeline(F, cfg, orig, ref, size, xs, ys, nn_params,
                              lambda_fp)
        out["size"] = size
        return out

    if pos32:
        arrs["c32"] = run(pos32, 32)
        arrs["c16"] = run(sub16, 16)
        use32 = np.asarray(_choose32(arrs["c32"], arrs["c16"], lam))
    if pos16_free:
        arrs["cf"] = run(pos16_free, 16)
    if pos8:
        arrs["c8"] = run(pos8, 8)
    return _build_per_cu(cfg, grids, arrs, use32)


_JAX_STAGE_CACHE: dict = {}


def _stage_fn(cfg, nn_params, lambda_fp):
    """Jitted device stage (hierarchical 32/16 + borders).
    fn(oy, ou, ov, ry, ru, rv) -> (packed_uint8, rec_y, rec_u, rec_v);
    recon planes stay device-resident for LD-P chaining."""
    import jax
    import jax.numpy as jnp

    sps = cfg.sps
    w, h = sps.coded_width, sps.coded_height
    key = (cfg.fme_mode, cfg.qp, sps.bit_depth, min(cfg.search_range, 16),
           lambda_fp, w, h,
           cfg.nn_weights_dir if nn_params is not None else None)
    cached = _JAX_STAGE_CACHE.get(key)
    if cached is not None:
        return cached
    F = _jax_backend()
    grids = _grid_hier(w, h)
    pos32, sub16, pos16_free, pos8 = grids
    lam = _full_lambda_fp(cfg)
    nn_dev = ({k: jnp.asarray(v) for k, v in nn_params.items()}
              if nn_params is not None and cfg.fme_mode == "nn" else None)

    def u8(x):
        return jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(-1)

    def blk_idx(poss, size, stride, cdiv):
        return np.concatenate([
            (((y // cdiv) + np.arange(size))[:, None] * stride
             + (x // cdiv) + np.arange(size)[None, :]).reshape(-1)
            for x, y in poss]) if poss else np.zeros(0, np.int64)

    def run(oy, ou, ov, ry, ru, rv):
        orig = (oy, ou, ov)
        ref = (ry, ru, rv)
        outs = []
        rec_y = jnp.zeros(h * w + 1, jnp.int32)
        rec_u = jnp.zeros(h * w // 4 + 1, jnp.int32)
        rec_v = jnp.zeros(h * w // 4 + 1, jnp.int32)
        arrs = {}

        def run_class(poss, size):
            xs = np.array([p[0] for p in poss])
            ys = np.array([p[1] for p in poss])
            out = _class_pipeline(F, cfg, orig, ref, size, xs, ys, nn_dev,
                                  lambda_fp)
            out["size"] = size
            return out

        use32 = None
        if pos32:
            arrs["c32"] = run_class(pos32, 32)
            arrs["c16"] = run_class(sub16, 16)
            use32 = _choose32(arrs["c32"], arrs["c16"], lam)
        if pos16_free:
            arrs["cf"] = run_class(pos16_free, 16)
        if pos8:
            arrs["c8"] = run_class(pos8, 8)

        def scatter(recs, poss, size, mask=None):
            nonlocal rec_y, rec_u, rec_v
            n = len(poss)
            yi = jnp.asarray(blk_idx(poss, size, w, 1)).reshape(n, -1)
            ui = jnp.asarray(blk_idx(poss, size // 2, w // 2, 2)).reshape(n, -1)
            if mask is not None:
                dump_y = jnp.full_like(yi, h * w)
                dump_c = jnp.full_like(ui, h * w // 4)
                yi = jnp.where(mask[:, None], yi, dump_y)
                ui = jnp.where(mask[:, None], ui, dump_c)
            rec_y = rec_y.at[yi.reshape(-1)].set(recs["rec"].reshape(-1))
            rec_u = rec_u.at[ui.reshape(-1)].set(recs["rec_u"].reshape(-1))
            rec_v = rec_v.at[ui.reshape(-1)].set(recs["rec_v"].reshape(-1))

        if pos32:
            m32 = use32
            scatter(arrs["c16"], sub16, 16, jnp.repeat(~m32, 4))
            scatter(arrs["c32"], pos32, 32, m32)
        if pos16_free:
            scatter(arrs["cf"], pos16_free, 16)
        if pos8:
            scatter(arrs["c8"], pos8, 8)

        for tag in ("c32", "c16", "cf", "c8"):
            if tag not in arrs:
                continue
            a = arrs[tag]
            outs += [u8(a["mvq"]), u8(a["sad9"].astype(jnp.int32)),
                     u8(a["mv_int"]), u8(a["lvl"].astype(jnp.int16)),
                     a["rec"].astype(jnp.uint8).reshape(-1),
                     u8(a["lvl_u"].astype(jnp.int16)),
                     a["rec_u"].astype(jnp.uint8).reshape(-1),
                     u8(a["lvl_v"].astype(jnp.int16)),
                     a["rec_v"].astype(jnp.uint8).reshape(-1)]
        if use32 is not None:
            outs.append(u8(use32.astype(jnp.int32)))
        return (jnp.concatenate(outs),
                rec_y[:-1].reshape(h, w),
                rec_u[:-1].reshape(h // 2, w // 2),
                rec_v[:-1].reshape(h // 2, w // 2))

    fn = jax.jit(run)
    _JAX_STAGE_CACHE[key] = (fn, grids)
    return fn, grids


def _stage_collect(cfg, buf: np.ndarray, grids) -> dict:
    """Fetched uint8 buffer -> per-CU dict (mirrors _stage_fn packing)."""
    pos32, sub16, pos16_free, pos8 = grids
    off = 0

    def take(nbytes, dtype, shape):
        nonlocal off
        out = np.frombuffer(buf[off : off + nbytes].tobytes(), dtype=dtype)
        off += nbytes
        return out.reshape(shape)

    arrs = {}
    for tag, poss, size in (("c32", pos32, 32), ("c16", sub16, 16),
                            ("cf", pos16_free, 16), ("c8", pos8, 8)):
        if not poss:
            continue
        n = len(poss)
        cs = size // 2
        arrs[tag] = dict(
            size=size,
            mvq=take(n * 8, np.int32, (n, 2)),
            sad9=take(n * 36, np.int32, (n, 9)),
            mv_int=take(n * 8, np.int32, (n, 2)),
            lvl=take(n * size * size * 2, np.int16, (n, size, size)),
            rec=take(n * size * size, np.uint8, (n, size, size)),
            lvl_u=take(n * cs * cs * 2, np.int16, (n, cs, cs)),
            rec_u=take(n * cs * cs, np.uint8, (n, cs, cs)),
            lvl_v=take(n * cs * cs * 2, np.int16, (n, cs, cs)),
            rec_v=take(n * cs * cs, np.uint8, (n, cs, cs)),
        )
        arrs[tag]["mv"] = arrs[tag]["mvq"]
    use32 = None
    if pos32:
        use32 = take(len(pos32) * 4, np.int32, (len(pos32),)).astype(bool)
    return _build_per_cu(cfg, grids, arrs, use32)


def _compute_stage_jax(cfg, orig, ref, nn_params, lambda_fp):
    """Synchronous device stage (submit + fetch)."""
    import jax.numpy as jnp

    fn, grids = _stage_fn(cfg, nn_params, lambda_fp)
    oy, ou, ov = (jnp.asarray(np.asarray(a, dtype=np.int32)) for a in orig)
    ry, ru, rv = (jnp.asarray(np.asarray(a, dtype=np.int32)) for a in ref)
    buf, _, _, _ = fn(oy, ou, ov, ry, ru, rv)
    return _stage_collect(cfg, np.asarray(buf), grids)


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
    lambda_fp = int(round(np.sqrt(cfg.frame_lambda
                                  or qp_to_lambda(qp, 0.4624)) * 256))
    if cfg.fme_mode == "dctif" or cfg.pps.sign_data_hiding or cfg.rdoq:
        backend = "np"  # DCT-IF / SBH / RDOQ are host-side for now
    stage = _compute_stage_jax if backend == "jax" else _compute_stage_np
    per_cu = stage(cfg, (oy, ou, ov), (ry, ru, rv), nn_params, lambda_fp)
    return assemble_frame_p(
        cfg, per_cu,
        orig=(oy, ou, ov) if cfg.intra_in_inter else None)


def _merge_static_cus(per_cu: dict, w: int, h: int) -> dict:
    """Bottom-up CU agglomeration: an aligned 32x32 (then 64x64) region
    whose sub-CUs share one MV and have zero residual collapses into a
    single CU (one skip flag instead of 4/16 CU syntax sets). MC is
    position-independent, so recon/coeffs are unchanged — only syntax
    granularity improves. Counterpart of the RD quadtree preferring large
    SKIP CUs in static areas (TEncCu xCheckRDCostMerge2Nx2N)."""
    for size in (32, 64):
        half = size // 2
        for y0 in range(0, h - size + 1, size):
            for x0 in range(0, w - size + 1, size):
                subs = [per_cu.get((x0 + dx, y0 + dy))
                        for dy in (0, half) for dx in (0, half)]
                if any(s is None or s["size"] != half for s in subs):
                    continue
                mv0 = subs[0]["mv"]
                ref0 = subs[0].get("ref", 0)
                if not all((s["mv"] == mv0).all()
                           and s.get("ref", 0) == ref0 for s in subs):
                    continue
                if any(s["lvl"].any() or s["lvl_u"].any() or s["lvl_v"].any()
                       for s in subs):
                    continue
                rec = np.zeros((size, size), dtype=subs[0]["rec"].dtype)
                cs = half // 2
                rec_u = np.zeros((size // 2, size // 2), dtype=rec.dtype)
                rec_v = np.zeros_like(rec_u)
                ch = half // 2
                for dy, dx in ((0, 0), (0, half), (half, 0), (half, half)):
                    s = per_cu.pop((x0 + dx, y0 + dy))
                    rec[dy : dy + half, dx : dx + half] = s["rec"]
                    rec_u[dy // 2 : dy // 2 + ch, dx // 2 : dx // 2 + ch] = s["rec_u"]
                    rec_v[dy // 2 : dy // 2 + ch, dx // 2 : dx // 2 + ch] = s["rec_v"]
                per_cu[(x0, y0)] = dict(
                    size=size, mv=mv0, ref=ref0,
                    lvl=np.zeros((size, size), np.int32), rec=rec,
                    lvl_u=np.zeros((size // 2, size // 2), np.int32),
                    rec_u=rec_u,
                    lvl_v=np.zeros((size // 2, size // 2), np.int32),
                    rec_v=rec_v,
                )
    return per_cu


def assemble_frame_p(cfg: EncoderConfig, per_cu: dict, num_ref: int = 1,
                     ref_pocs=None, orig=None, agglomerate: bool = True):
    """Decode-order decision walk (merge/skip/AMVP) + dense-array assembly.
    Shared by the synchronous path and the pipelined LD-P loop. per_cu
    entries may carry "ref" (default 0); num_ref/ref_pocs must match the
    slice header so AMVP scaling agrees with the decoder. agglomerate=False
    when the CU sizes were already decided by the device quadtree (the
    grid path) so the host must not second-guess them."""
    from ..entropy.syntax import FrameSyntax

    sps = cfg.sps
    w, h = sps.coded_width, sps.coded_height
    if ref_pocs is None:
        ref_pocs = [-(i + 1) for i in range(num_ref)]
    fs = FrameSyntax(w, h)
    rec_y = np.zeros((h, w), dtype=np.int32)
    rec_u = np.zeros((h // 2, w // 2), dtype=np.int32)
    rec_v = np.zeros((h // 2, w // 2), dtype=np.int32)
    tiled = cfg.pps.tiles_enabled or cfg.slice_ctus > 0
    if tiled:
        from .tiles import segment_spans, seg_of_ctu, spans_block_order

        spans = segment_spans(cfg.sps, cfg.pps, cfg.slice_ctus)
        order = spans_block_order(cfg.sps, spans)
        fs.tile_order8 = order
        fs.tile_order4 = spans_block_order(cfg.sps, spans, cell_log2=2)
        seg_of = seg_of_ctu(cfg.sps, spans)
        wc = sps.pic_width_in_ctus
    else:
        order = BlockOrder(w, h, sps.log2_ctu)
    field = MvField(w // 8, h // 8)
    cur_seg = 0
    if agglomerate:
        per_cu = _merge_static_cus(per_cu, w, h)

    # --- decision walk in decode order (merge/skip/AMVP + store); with
    # tiles/slices the order follows the segment structure and the MV
    # field resets at each segment (candidates never cross) --------------
    cells = sorted(per_cu.keys(), key=lambda p: order.order[p[1] // 8, p[0] // 8])
    h8w8 = fs.cu_log2
    lam_intra = _full_lambda_fp(cfg)
    for x0, y0 in cells:
        if tiled:
            t = int(seg_of[(y0 >> sps.log2_ctu) * wc
                           + (x0 >> sps.log2_ctu)])
            if t != cur_seg:
                field = MvField(w // 8, h // 8)
                cur_seg = t
        cu = per_cu[(x0, y0)]
        size = cu["size"]
        log2 = size.bit_length() - 1
        if "intra_mode" in cu:
            # device-decided intra CU in a P slice: modes + coeffs only;
            # cells stay out of the MV field (unavailable as merge/AMVP
            # neighbors), matching the native walk's ref-255 handling
            s8 = size // 8
            y8_, x8_ = y0 // 8, x0 // 8
            m = int(cu["intra_mode"])
            fs.cu_log2[y8_ : y8_ + s8, x8_ : x8_ + s8] = log2
            fs.inter_dir[y8_ : y8_ + s8, x8_ : x8_ + s8] = 0
            fs.skip[y8_ : y8_ + s8, x8_ : x8_ + s8] = 0
            fs.merge_flag[y8_ : y8_ + s8, x8_ : x8_ + s8] = 0
            fs.luma_mode[y8_ : y8_ + s8, x8_ : x8_ + s8] = m
            fs.chroma_mode[y8_ : y8_ + s8, x8_ : x8_ + s8] = 4  # DM
            s4 = size // 4
            y4_, x4_ = y0 // 4, x0 // 4
            fs.luma_mode4[y4_ : y4_ + s4, x4_ : x4_ + s4] = m
            fs.tu_log2[y4_ : y4_ + s4, x4_ : x4_ + s4] = log2
            fs.full_features = True
            cs = size // 2
            fs.coeff_y[y0 : y0 + size, x0 : x0 + size] = cu["lvl"]
            fs.coeff_cb[y0 // 2 : y0 // 2 + cs,
                        x0 // 2 : x0 // 2 + cs] = cu["lvl_u"]
            fs.coeff_cr[y0 // 2 : y0 // 2 + cs,
                        x0 // 2 : x0 // 2 + cs] = cu["lvl_v"]
            rec_y[y0 : y0 + size, x0 : x0 + size] = cu["rec"]
            rec_u[y0 // 2 : y0 // 2 + cs,
                  x0 // 2 : x0 // 2 + cs] = cu["rec_u"]
            rec_v[y0 // 2 : y0 // 2 + cs,
                  x0 // 2 : x0 // 2 + cs] = cu["rec_v"]
            continue
        mv = tuple(int(v) for v in cu["mv"])
        ref = int(cu.get("ref", 0))
        cbf = bool(cu["lvl"].any() or cu["lvl_u"].any() or cu["lvl_v"].any())
        if (orig is not None and cfg.intra_in_inter and size <= 32):
            bits_inter = int(_bits_est_np(cu["lvl"][None])[0]
                             + _bits_est_np(cu["lvl_u"][None])[0]
                             + _bits_est_np(cu["lvl_v"][None])[0])
            if bits_inter > 40 * (size // 8) ** 2:  # pricey: evaluate intra
                from .recon import encode_intra_cu8

                ob = orig[0][y0 : y0 + size, x0 : x0 + size].astype(np.int32)
                sse_inter = int(((ob - cu["rec"]) ** 2).sum())
                cost_inter = 256 * sse_inter + lam_intra * (bits_inter + 24)
                cs = size // 2
                snap = (fs.coeff_y[y0 : y0 + size, x0 : x0 + size].copy(),
                        fs.coeff_cb[y0 // 2 : y0 // 2 + cs,
                                    x0 // 2 : x0 // 2 + cs].copy(),
                        fs.coeff_cr[y0 // 2 : y0 // 2 + cs,
                                    x0 // 2 : x0 // 2 + cs].copy(),
                        rec_y[y0 : y0 + size, x0 : x0 + size].copy(),
                        rec_u[y0 // 2 : y0 // 2 + cs,
                              x0 // 2 : x0 // 2 + cs].copy(),
                        rec_v[y0 // 2 : y0 // 2 + cs,
                              x0 // 2 : x0 // 2 + cs].copy())
                s8 = size // 8
                y8_, x8_ = y0 // 8, x0 // 8
                snap_modes = (
                    fs.luma_mode[y8_ : y8_ + s8, x8_ : x8_ + s8].copy(),
                    fs.chroma_mode[y8_ : y8_ + s8, x8_ : x8_ + s8].copy())
                rec_y[y0 : y0 + size, x0 : x0 + size] = cu["rec"]
                rec_u[y0 // 2 : y0 // 2 + cs, x0 // 2 : x0 // 2 + cs] = \
                    cu["rec_u"]
                rec_v[y0 // 2 : y0 // 2 + cs, x0 // 2 : x0 // 2 + cs] = \
                    cu["rec_v"]
                sse_intra = 0
                sub = sorted(
                    ((x0 + dx, y0 + dy) for dy in range(0, size, 8)
                     for dx in range(0, size, 8)),
                    key=lambda p_: order.order[p_[1] // 8, p_[0] // 8])
                # cu_qp_delta: the CU dequants at its CTU's QpY, so the
                # intra fallback must quantize there too (the decoder and
                # HM both reconstruct at the signaled per-CTU QP)
                qmap = getattr(cfg, "ctu_qp_map", None)
                qp_cu = (int(np.asarray(qmap)[y0 >> sps.log2_ctu,
                                              x0 >> sps.log2_ctu])
                         if qmap is not None else cfg.qp)
                for sx, sy in sub:  # decode order over the 8-cells
                    sse_intra += encode_intra_cu8(
                        fs, sps, qp_cu, (rec_y, rec_u, rec_v), orig,
                        sx // 8, sy // 8, order, lam_intra)
                bits_intra = int(
                    _bits_est_np(fs.coeff_y[y0 : y0 + size,
                                            x0 : x0 + size][None])[0]
                ) + 10 * (size // 8) ** 2
                cost_intra = 256 * sse_intra + lam_intra * bits_intra
                if cost_intra < cost_inter:
                    continue  # keep intra; cells stay out of the MV field
                # undo: restore coeffs/recon and fall through to inter
                fs.coeff_y[y0 : y0 + size, x0 : x0 + size] = snap[0]
                fs.coeff_cb[y0 // 2 : y0 // 2 + cs,
                            x0 // 2 : x0 // 2 + cs] = snap[1]
                fs.coeff_cr[y0 // 2 : y0 // 2 + cs,
                            x0 // 2 : x0 // 2 + cs] = snap[2]
                rec_y[y0 : y0 + size, x0 : x0 + size] = snap[3]
                rec_u[y0 // 2 : y0 // 2 + cs,
                      x0 // 2 : x0 // 2 + cs] = snap[4]
                rec_v[y0 // 2 : y0 // 2 + cs,
                      x0 // 2 : x0 // 2 + cs] = snap[5]
                fs.inter_dir[y8_ : y8_ + s8, x8_ : x8_ + s8] = 1
                fs.cu_log2[y8_ : y8_ + s8, x8_ : x8_ + s8] = log2
                fs.luma_mode[y8_ : y8_ + s8, x8_ : x8_ + s8] = snap_modes[0]
                fs.chroma_mode[y8_ : y8_ + s8, x8_ : x8_ + s8] = \
                    snap_modes[1]
        mcands = merge_candidates(field, order, x0, y0, size,
                                  cfg.max_num_merge_cand, num_ref)
        mvr = (mv[0], mv[1], ref)
        merge_i = next((k for k, c in enumerate(mcands) if c == mvr), -1)
        y8, x8 = y0 // 8, x0 // 8
        s8 = size // 8
        fs.cu_log2[y8 : y8 + s8, x8 : x8 + s8] = log2
        fs.mv[y8 : y8 + s8, x8 : x8 + s8] = mv
        fs.ref_idx[y8 : y8 + s8, x8 : x8 + s8] = ref
        if merge_i >= 0 and not cbf:
            fs.skip[y8 : y8 + s8, x8 : x8 + s8] = 1
            fs.merge_flag[y8 : y8 + s8, x8 : x8 + s8] = 1
            fs.merge_idx[y8 : y8 + s8, x8 : x8 + s8] = merge_i
        elif merge_i >= 0:
            fs.merge_flag[y8 : y8 + s8, x8 : x8 + s8] = 1
            fs.merge_idx[y8 : y8 + s8, x8 : x8 + s8] = merge_i
        else:
            acands = amvp_candidates(field, order, x0, y0, size, ref,
                                     ref_pocs, 0)
            costs = [abs(mv[0] - c[0]) + abs(mv[1] - c[1]) for c in acands]
            mvp = int(np.argmin(costs))
            fs.mvp_flag[y8 : y8 + s8, x8 : x8 + s8] = mvp
            fs.mvd[y8 : y8 + s8, x8 : x8 + s8] = (
                mv[0] - acands[mvp][0], mv[1] - acands[mvp][1])
        field.set_cu(x0, y0, size, mv, ref)
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


def _add_residual_tiled(pred, blk, qp, bd, T=None):
    """Inverse transform + add, tiling TUs at T (default min(size, 32):
    a 64 CU is coded as a forced RQT split into 4 32x32 luma TUs with
    16x16 chroma TUs)."""
    size = blk.shape[0]
    T = T or min(size, 32)
    log2t = T.bit_length() - 1
    out = pred
    for ty in range(0, size, T):
        for tx_ in range(0, size, T):
            t = blk[ty : ty + T, tx_ : tx_ + T]
            if not t.any():
                continue
            d = tx.dequantize_np(t[None], qp, log2t, bd)[0]
            r = tx.inverse_transform_np(d[None], bd)[0]
            out = out.copy() if out is pred else out
            out[ty : ty + T, tx_ : tx_ + T] = np.clip(
                out[ty : ty + T, tx_ : tx_ + T] + r, 0, (1 << bd) - 1)
    return out


def reconstruct_frame_p(fs, sps, qp: int, ref_recon):
    """Decoder-side P-frame reconstruction from parsed FrameSyntax.
    ref_recon: one (y, u, v) tuple or a list of them (L0 order).
    Invariant: TU = min(CU, 32), 2Nx2N (what this framework emits)."""
    bd = sps.bit_depth
    w, h = fs.width, fs.height
    if isinstance(ref_recon, tuple) or (isinstance(ref_recon, list)
                                        and len(ref_recon) == 3
                                        and hasattr(ref_recon[0], "shape")):
        ref_recon = [ref_recon]
    refs = [tuple(p.astype(np.int32) for p in r) for r in ref_recon]
    qp_ctu = getattr(fs, "qp_ctu", None)
    log2_ctu = sps.log2_ctu
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
            if qp_ctu is not None:  # cu_qp_delta: the CTU's coded QpY
                qp = int(qp_ctu[y0 >> log2_ctu, x0 >> log2_ctu])
                qpc = chroma_qp(qp)
            mv = fs.mv[y8, x8][None]
            ry, ru, rv = refs[min(int(fs.ref_idx[y8, x8]), len(refs) - 1)]
            pred = mc_np(ry, np.array([x0]), np.array([y0]), mv, size, True, bd)[0]
            blk = fs.coeff_y[y0 : y0 + size, x0 : x0 + size]
            if blk.any():
                pred = _add_residual_tiled(pred, blk, qp, bd)
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
                    cpred = _add_residual_tiled(
                        cpred, cblk, qpcc, bd,
                        T=16 if size == 64 else cs)
                plane[cy : cy + cs, cx : cx + cs] = cpred
    return rec_y, rec_u, rec_v
