"""Quadtree intra encoder: CU sizes 8/16/32 with TU = CU.

Counterpart of the reference's recursive intra mode decision
(TEncCu::xCompressCU intra trials TEncCu.cpp:644-650 +
TEncSearch::estIntraPredLumaQT TEncSearch.cpp:2945 — SURVEY.md §A.3),
re-designed TPU-first: instead of HM's sequential RD recursion with
CABAC-state snapshots, the mode/split DECISIONS are made in a parallel
open-loop pass (reference samples taken from the original picture, so
every block of a size class is independent and batchable), then one
closed-loop CODING pass walks the decided partition in decode order
producing the spec-exact reconstruction. The open-loop decision costs
use the real transform/quantizer and CABAC fractional-bit estimates
(entropy.bitest), so the split choice is RD-driven like HM's, at the
cost of slightly stale reference pixels.

The decoder-side walk (reconstruct_frame_qt) mirrors the coding pass
exactly (shared reference gathering + predictors), so encoder recon ==
decoder recon by construction; conformance is cross-checked against the
reference TAppDecoder.
"""

from __future__ import annotations

import numpy as np

from ..entropy.bitest import FracBits, ResidualBitEst
from ..ops import transforms as tx
from ..ops.cost import satd_np
from ..ops.intra import predict_block_np
from ..utils.tables import chroma_qp, intra_mpm_list, intra_scan_idx, qp_to_lambda
from .params import EncoderConfig
from .refsamples import BlockOrder, gather_refs_qt

I_ROW = 2  # I-slice context init row
NC_SMALL = 8  # full-RD candidates at 4x4/8x8 (HM: 8)


# --- open-loop decision pass ------------------------------------------------

def _openloop_refs(plane: np.ndarray, S: int, nh: int, nw: int):
    """(top, left) refs of length 2S+1 for every aligned SxS block, taken
    from the ORIGINAL plane with edge replication (decision pass only —
    the coding pass re-derives spec refs from the reconstruction)."""
    pp = np.pad(plane, ((1, 2 * S), (1, 2 * S)), mode="edge")
    ys = (np.arange(nh) * S)[:, None, None]          # padded row of block
    xs = (np.arange(nw) * S)[None, :, None]
    rng = np.arange(2 * S + 1)[None, None, :]
    tops = pp[ys + 0, xs + rng].reshape(nh * nw, -1).astype(np.int32)
    lefts = pp[ys + rng, xs + 0].reshape(nh * nw, -1).astype(np.int32)
    return tops, lefts


def _batched_modes(tops, lefts, S, is_luma, bd, strong):
    """(N, 35, S, S) predictions via the batched numpy predictor bank
    (host decision pass; the jnp bank's math twin, tested equal)."""
    from ..ops.intra import predict_all_modes_np

    return predict_all_modes_np(tops, lefts, S, is_luma=is_luma,
                                bit_depth=bd, strong_smoothing=strong)


_HAD8_F32 = None


def _had8_f32():
    global _HAD8_F32
    if _HAD8_F32 is None:
        from ..ops.cost import hadamard

        _HAD8_F32 = hadamard(8).astype(np.float32)
    return _HAD8_F32


def _mode_bits_tab(fb: FracBits):
    """(mpm_idx0, mpm_idx12, non-mpm) luma mode bits."""
    f1 = fb.b("prev_intra_luma_pred_flag", 0, 1)
    f0 = fb.b("prev_intra_luma_pred_flag", 0, 0)
    return (f1 + 1.0, f1 + 2.0, f0 + 5.0)


def _txq_cost(resi, qp, log2, bd, lam_fp, rdoq, est, is_dst=False,
              lam_scale=1.0):
    """(N, S, S) residual -> (levels, D_sse, bits) with the real
    transform/quant + estimator bits. Intra-slice rounding. lam_scale:
    chroma passes 1/wch so the RDOQ level choice trades chroma-domain
    distortion against the slice lambda consistently with the RD
    arbitration (HM weights chroma D by wch instead)."""
    c = tx.forward_transform_np(resi, bd, is_dst)
    if rdoq:
        lvl = tx.rdoq_est_xp(np, c, qp, log2, bd,
                             (lam_fp / 256.0) * lam_scale, est)
    else:
        lvl = tx.quantize_np(c, qp, log2, bd, True)
    d = tx.dequantize_np(lvl, qp, log2, bd)
    r = tx.inverse_transform_np(d, bd, is_dst)
    err = resi - r
    dist = (err.astype(np.float64) ** 2).sum(axis=(1, 2))
    bits = np.asarray(est.tu_bits(np, lvl), np.float64)
    return lvl, dist, bits


_HAD4_F32 = None


def _had4_f32():
    global _HAD4_F32
    if _HAD4_F32 is None:
        from ..ops.cost import hadamard

        _HAD4_F32 = hadamard(4).astype(np.float32)
    return _HAD4_F32


def decide_intra_qt(oy, ou, ov, cfg: EncoderConfig, qp: int,
                    ref_planes=None):
    """Open-loop quadtree decision. Returns (cu_log2, luma_mode,
    chroma_mode, nxn, luma_mode4, tu_split) maps: NxN 4x4 PUs at the min
    CU (TEncCu.cpp:644-650), one-level TU split per CU
    (estIntraPredLumaQT's RQT pass, TEncSearch.cpp:3116), candidate
    counts per HM's g_aucIntraModeNumFast_UseMPM (8 for 4x4/8x8, 3
    above)."""
    from .params import i_frame_lambda

    ry, ru, rv = ref_planes if ref_planes is not None else (oy, ou, ov)
    sps = cfg.sps
    bd = sps.bit_depth
    h, w = oy.shape
    h8, w8 = h // 8, w // 8
    h4, w4 = h // 4, w // 4
    lam = i_frame_lambda(cfg, qp)
    sqlam = np.sqrt(lam)
    lam_fp = int(round(lam * 256))
    fb = FracBits(I_ROW, qp)
    mpm0_b, mpm12_b, esc_b = _mode_bits_tab(fb)
    split_b = [fb.b("split_cu_flag", 1, v) for v in (0, 1)]
    part_b = fb.b("part_mode", 0, 1)      # 2Nx2N bin at min CU
    part_nxn_b = fb.b("part_mode", 0, 0)  # NxN bin
    cbf1_b = fb.b("qt_cbf", 1, 1)
    cbf0_b = fb.b("qt_cbf", 1, 0)
    scbf1_b = fb.b("qt_cbf", 0, 1)        # depth>0 luma cbf
    scbf0_b = fb.b("qt_cbf", 0, 0)
    ccbf_b = fb.b("qt_cbf", 5, 0)  # two chroma cbf flags per CU
    qpc = chroma_qp(qp)
    wch = 2.0 ** ((qp - qpc) / 3.0)  # HM chroma distortion weight
    # explicit one-level TU split legal only when the SPS grants depth
    tusplit_on = sps.max_tu_depth_intra >= 1

    sizes = [4, 8, 16, 32]
    cost_tree: dict[int, np.ndarray] = {}
    mode_by_size: dict[int, np.ndarray] = {}
    cmode_maps: dict[int, np.ndarray] = {}
    split_of: dict[int, np.ndarray] = {}
    tusplit_of: dict[int, np.ndarray] = {}
    preds_of: dict[int, np.ndarray] = {}
    org_of: dict[int, np.ndarray] = {}
    topk_of: dict[int, np.ndarray] = {}
    rdd_of: dict[int, np.ndarray] = {}
    rdb_of: dict[int, np.ndarray] = {}
    nxn_map = np.zeros((h8, w8), np.int8)
    lm4 = np.zeros((h4, w4), np.int8)

    def _tsplit_cost(S, m_parent, nh, nw):
        """Luma cost of splitting every S-CU (parent mode per CU) into 4
        S/2 TBs predicted open-loop at their own boundaries."""
        C = S // 2
        log2c_ = C.bit_length() - 1
        nh2, nw2 = h // C, w // C
        ph = preds_of[C]
        oh = org_of[C]
        # child flat indices of CU (by,bx): rows 2by+dy, cols 2bx+dx
        by, bx = np.meshgrid(np.arange(nh), np.arange(nw), indexing="ij")
        ch = []
        for dy in (0, 1):
            for dx in (0, 1):
                ch.append(((by * 2 + dy) * nw2 + (bx * 2 + dx)).reshape(-1))
        est2 = ResidualBitEst(fb, log2c_, True)
        mrep = m_parent.reshape(-1)
        d_sum = np.zeros(nh * nw)
        b_sum = np.zeros(nh * nw)
        for idx in ch:
            sel = ph[idx, mrep]
            orgc = oh[idx]
            _, dist, rbits = _txq_cost(orgc - sel, qp, log2c_, bd, lam_fp,
                                       cfg.rdoq, est2, is_dst=(C == 4))
            d0 = ((orgc - sel).astype(np.float64) ** 2).sum(axis=(1, 2))
            use = dist + lam * (rbits + scbf1_b) < d0 + lam * scbf0_b
            d_sum += np.where(use, dist, d0)
            b_sum += np.where(use, rbits + scbf1_b, scbf0_b)
        return d_sum, b_sum

    for S in sizes:
        log2 = S.bit_length() - 1
        nh, nw = h // S, w // S
        if nh == 0 or nw == 0:
            cost_tree[S] = None
            continue
        N = nh * nw
        tops, lefts = _openloop_refs(ry, S, nh, nw)
        preds = _batched_modes(tops, lefts, S, True, bd,
                               sps.strong_intra_smoothing)
        org = np.ascontiguousarray(
            oy[: nh * S, : nw * S].reshape(nh, S, nw, S)
            .transpose(0, 2, 1, 3).reshape(N, S, S))
        # SATD prescreen over all 35 modes (Hadamard tiles), in float32
        # BLAS: |values| stay < 2^24 so the result is exact
        dd = (org[:, None] - preds).astype(np.float32)  # (N, 35, S, S)
        if S >= 8:
            t8 = dd.reshape(N, 35, S // 8, 8, S // 8, 8).transpose(
                0, 1, 2, 4, 3, 5).reshape(-1, 8, 8)
            Hf = _had8_f32()
            m = Hf @ t8 @ Hf.T
            sat = ((np.abs(m).sum((1, 2)) + 2) // 4).reshape(
                N, 35, -1).sum(-1).astype(np.float64)
        else:
            H4 = _had4_f32()
            m = H4 @ dd.reshape(-1, 4, 4) @ H4.T
            sat = ((np.abs(m).sum((1, 2)) + 1) // 2).reshape(
                N, 35).astype(np.float64)
        # HM candidate counts (g_aucIntraModeNumFast_UsePM): 8 full-RD
        # candidates at 4x4/8x8, 3 at 16/32
        nc = NC_SMALL if S <= 8 else 3
        topk = np.argsort(sat, axis=1)[:, :nc]

        # full RD (transform + quant + estimator bits) for the SATD
        # candidates — TEncSearch's two-stage prescreen (SURVEY.md §A.3)
        est = ResidualBitEst(fb, log2, True)
        rd_d = np.empty((N, nc))
        rd_b = np.empty((N, nc))
        for k in range(nc):
            sel = preds[np.arange(N), topk[:, k]]
            lvl, dist, rbits = _txq_cost(org - sel, qp, log2, bd, lam_fp,
                                         cfg.rdoq, est, is_dst=(S == 4))
            d0 = ((org - sel).astype(np.float64) ** 2).sum(axis=(1, 2))
            use = dist + lam * (rbits + cbf1_b) < d0 + lam * cbf0_b
            rd_d[:, k] = np.where(use, dist, d0)
            rd_b[:, k] = np.where(use, rbits + cbf1_b, cbf0_b)
        preds_of[S] = preds
        org_of[S] = org
        topk_of[S] = topk
        rdd_of[S] = rd_d
        rdb_of[S] = rd_b
        if S == 4:
            continue  # PU class only (consumed by the S == 8 NxN trial)

        # MPM-aware final pick among the candidates (raster; decisions)
        mode_sel = np.empty(N, np.int32)
        dL = np.empty(N)
        bL = np.empty(N)
        mbits = np.empty(N)
        m2d = np.full((nh, nw), 1, np.int32)
        for by in range(nh):
            for bx in range(nw):
                i = by * nw + bx
                lm = int(m2d[by, bx - 1]) if bx else 1
                am = int(m2d[by - 1, bx]) if by else 1
                cand = intra_mpm_list(lm, am)
                bc = None
                for k in range(nc):
                    m = int(topk[i, k])
                    if m in cand:
                        mb = mpm0_b if cand.index(m) == 0 else mpm12_b
                    else:
                        mb = esc_b
                    c = rd_d[i, k] + lam * (rd_b[i, k] + mb)
                    if bc is None or c < bc:
                        bc = c
                        m2d[by, bx] = m
                        mode_sel[i] = m
                        dL[i] = rd_d[i, k]
                        bL[i] = rd_b[i, k] + mb
                        mbits[i] = mb
        mode_by_size[S] = m2d

        # one-level TU split per CU (winner mode): the RQT trial
        tusplit_of[S] = np.zeros((nh, nw), bool)
        if tusplit_on:
            d2, b2 = _tsplit_cost(S, m2d, nh, nw)
            sdelta = (fb.b("split_transform_flag", 5 - log2, 1)
                      - fb.b("split_transform_flag", 5 - log2, 0))
            c_cu = dL + lam * bL
            c_sp = d2 + lam * (b2 + sdelta + mbits)
            tsp = c_sp < c_cu
            tusplit_of[S] = tsp.reshape(nh, nw)
            dL = np.where(tsp, d2, dL)
            bL = np.where(tsp, b2 + sdelta + mbits, bL)

        # chroma mode decision at S/2 (>= 4): candidates planar/26/10/DC
        # with the angular-replacement rule + DM (estIntraPredChromaQT)
        Sc = max(4, S // 2)
        log2c = Sc.bit_length() - 1
        cest = ResidualBitEst(fb, log2c, False)
        dm_b = fb.b("intra_chroma_pred_mode", 0, 0)
        ex_b = fb.b("intra_chroma_pred_mode", 0, 1) + 2.0
        ccost = np.zeros((N, 5))
        cd_by = np.zeros((N, 5))
        cb_by = np.zeros((N, 5))
        for plane, rplane in ((ou, ru), (ov, rv)):
            ctops, clefts = _openloop_refs(rplane, Sc, nh, nw)
            cpreds = _batched_modes(ctops, clefts, Sc, False, bd, False)
            corg = np.ascontiguousarray(
                plane[: nh * Sc, : nw * Sc].reshape(nh, Sc, nw, Sc)
                .transpose(0, 2, 1, 3).reshape(N, Sc, Sc))
            for ci in range(5):
                if ci == 4:
                    am = mode_sel  # DM
                else:
                    base = (0, 26, 10, 1)[ci]
                    am = np.where(mode_sel == base, 34, base)
                cpsel = cpreds[np.arange(N), am]
                _, cd, cb = _txq_cost(corg - cpsel, qpc, log2c, bd,
                                      lam_fp, cfg.rdoq, cest,
                                      lam_scale=1.0 / wch)
                cd0 = ((corg - cpsel).astype(np.float64)
                       ** 2).sum(axis=(1, 2))
                cuse = wch * cd + lam * cb < wch * cd0
                cd_by[:, ci] += np.where(cuse, cd, cd0)
                cb_by[:, ci] += np.where(cuse, cb, 0.0)
        for ci in range(5):
            mb = dm_b if ci == 4 else ex_b
            ccost[:, ci] = (wch * cd_by[:, ci]
                            + lam * (cb_by[:, ci] + mb))
        csel = np.argmin(ccost, axis=1)
        cmode_maps[S] = csel.reshape(nh, nw)
        cbest = ccost[np.arange(N), csel]

        cost = dL + cbest + lam * (bL + 2 * ccbf_b + 1.0)
        if S == 8:
            cost = cost + lam * part_b
            # NxN trial (TEncCu.cpp:644-650): per-PU best of the 4x4
            # top-8 with MPM-aware mode bits; MPMs chain through the
            # CU's own PUs (outside neighbors approximated by the
            # 8-level winner map, like the rest of this open-loop pass)
            topk4, rdd4, rdb4 = topk_of[4], rdd_of[4], rdb_of[4]
            nxn_d = np.zeros(N)
            nxn_b = np.zeros(N)
            pumode = np.zeros((N, 4), np.int32)
            nw4g = w // 4
            for by in range(nh):
                for bx in range(nw):
                    i = by * nw + bx
                    lm_out = int(m2d[by, bx - 1]) if bx else 1
                    am_out = int(m2d[by - 1, bx]) if by else 1
                    pm = [1, 1, 1, 1]
                    td = tb = 0.0
                    for q, (dx, dy) in enumerate(
                            ((0, 0), (1, 0), (0, 1), (1, 1))):
                        ci = (by * 2 + dy) * nw4g + (bx * 2 + dx)
                        left_m = pm[q - 1] if dx else lm_out
                        above_m = pm[q - 2] if dy else am_out
                        cand = intra_mpm_list(left_m, above_m)
                        bc = None
                        for k in range(topk4.shape[1]):
                            m_ = int(topk4[ci, k])
                            if m_ in cand:
                                mb = (mpm0_b if cand.index(m_) == 0
                                      else mpm12_b)
                            else:
                                mb = esc_b
                            c_ = rdd4[ci, k] + lam * (rdb4[ci, k] + mb)
                            if bc is None or c_ < bc:
                                bc = c_
                                pm[q] = m_
                                bd_k = rdd4[ci, k]
                                bb_k = rdb4[ci, k] + mb
                        td += bd_k
                        tb += bb_k
                    nxn_d[i] = td
                    nxn_b[i] = tb
                    pumode[i] = pm
            cost_nxn = (nxn_d + cbest
                        + lam * (nxn_b + 2 * ccbf_b + 1.0 + part_nxn_b))
            use_nxn = cost_nxn < cost
            cost = np.minimum(cost, cost_nxn)
            nxn_sel8 = use_nxn.reshape(nh, nw)
            pumode8 = pumode.reshape(nh, nw, 4)
        cost_tree[S] = cost.reshape(nh, nw)

    # bottom-up tree compare
    tree8 = cost_tree[8]
    t16 = None
    if cost_tree.get(16) is not None:
        nh16, nw16 = cost_tree[16].shape
        sum8 = tree8[: nh16 * 2, : nw16 * 2].reshape(
            nh16, 2, nw16, 2).sum((1, 3))
        c16 = cost_tree[16] + lam * split_b[0]
        s16 = sum8 + lam * split_b[1]
        split_of[16] = s16 < c16
        t16 = np.minimum(c16, s16)
    t32 = None
    if cost_tree.get(32) is not None and t16 is not None:
        nh32, nw32 = cost_tree[32].shape
        sum16 = t16[: nh32 * 2, : nw32 * 2].reshape(
            nh32, 2, nw32, 2).sum((1, 3))
        c32 = cost_tree[32] + lam * split_b[0]
        s32 = sum16 + lam * split_b[1]
        split_of[32] = s32 < c32
        t32 = np.minimum(c32, s32)

    # compose maps (default: 8)
    cu_log2 = np.full((h8, w8), 3, np.int8)
    lm8 = np.zeros((h8, w8), np.int8)
    lm8[:, :] = mode_by_size[8]
    cm8 = np.zeros((h8, w8), np.int8)
    cm8[:, :] = cmode_maps[8]
    tsp8 = np.zeros((h8, w8), bool)
    tsp8[:, :] = tusplit_of[8]
    if t16 is not None:
        nh16, nw16 = cost_tree[16].shape
        keep16 = ~split_of[16]
        for by in range(nh16):
            for bx in range(nw16):
                if keep16[by, bx]:
                    sl = np.s_[by * 2 : by * 2 + 2, bx * 2 : bx * 2 + 2]
                    cu_log2[sl] = 4
                    lm8[sl] = mode_by_size[16][by, bx]
                    cm8[sl] = cmode_maps[16][by, bx]
                    tsp8[sl] = tusplit_of[16][by, bx]
    if t32 is not None:
        nh32, nw32 = cost_tree[32].shape
        keep32 = ~split_of[32]
        for by in range(nh32):
            for bx in range(nw32):
                if keep32[by, bx]:
                    sl = np.s_[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4]
                    cu_log2[sl] = 5
                    lm8[sl] = mode_by_size[32][by, bx]
                    cm8[sl] = cmode_maps[32][by, bx]
                    tsp8[sl] = tusplit_of[32][by, bx]
    # NxN winners at surviving min-size CUs: PU modes into the 4-map
    nxn_map[:, :] = np.where(cu_log2 == 3, nxn_sel8, False)
    lm4[0::2, 0::2] = lm8
    lm4[0::2, 1::2] = lm8
    lm4[1::2, 0::2] = lm8
    lm4[1::2, 1::2] = lm8
    for y8, x8 in zip(*np.nonzero(nxn_map)):
        pm = pumode8[y8, x8]
        lm8[y8, x8] = pm[0]
        lm4[y8 * 2, x8 * 2] = pm[0]
        lm4[y8 * 2, x8 * 2 + 1] = pm[1]
        lm4[y8 * 2 + 1, x8 * 2] = pm[2]
        lm4[y8 * 2 + 1, x8 * 2 + 1] = pm[3]
        tsp8[y8, x8] = False  # IntraSplit carries the 4x4 TBs already
    return cu_log2, lm8, cm8, nxn_map, lm4, tsp8


# --- closed-loop coding / reconstruction walk -------------------------------

def _cu_roots(cu_log2: np.ndarray, order: BlockOrder):
    """CU top-left cells in decode order."""
    h8, w8 = cu_log2.shape
    roots = []
    for y8 in range(h8):
        for x8 in range(w8):
            n = 1 << (int(cu_log2[y8, x8]) - 3)
            if x8 % n == 0 and y8 % n == 0:
                roots.append((x8, y8))
    roots.sort(key=lambda c: order.order[c[1], c[0]])
    return roots


def _code_tb(plane, coeff_pl, orig_pl, x0, y0, size, mode, order, qp,
             is_luma, bd, strong, sdh, rdoq, lam_fp, cell_px, encode,
             sl=False, est=None, lam_scale=1.0):
    """Shared per-TB walk step: predict from recon refs; encoder mode
    (encode=True) quantizes orig-pred into coeff_pl, decoder mode reads
    coeff_pl; both reconstruct identically. sl: default scaling lists
    (quant/dequant per-position m; the RDOQ proxy stays flat-list so
    plain quant is used instead)."""
    top, left = gather_refs_qt(plane, x0, y0, size, order, bd, cell_px)
    pred = predict_block_np(top, left, mode, size, is_luma, bd, strong)
    log2 = size.bit_length() - 1
    is_dst = is_luma and size == 4  # 4x4 intra luma: DST-VII (§8.6.4.1)
    m = tx.default_scaling_matrix(log2, True) if sl else None
    if encode:
        oblk = orig_pl[y0 : y0 + size, x0 : x0 + size].astype(np.int32)
        c = tx.forward_transform_np((oblk - pred)[None], bd, is_dst)[0]
        if rdoq and m is None:
            if est is not None:
                lvl = tx.rdoq_est_xp(np, c[None], qp, log2, bd,
                                     (lam_fp / 256.0) * lam_scale,
                                     est)[0]
            else:
                lvl = tx.rdoq_np(c[None], qp, log2, bd, lam_fp,
                                 is_intra_slice=True)[0]
        else:
            lvl = tx.quantize_np(c[None], qp, log2, bd, True, m=m)[0]
        if sdh:
            from ..entropy.residual import apply_sign_bit_hiding

            lvl = apply_sign_bit_hiding(
                lvl, log2, intra_scan_idx(mode, log2, is_luma),
                tx.ideal_levels_np(c, qp, log2, bd))
        coeff_pl[y0 : y0 + size, x0 : x0 + size] = lvl
    else:
        lvl = coeff_pl[y0 : y0 + size, x0 : x0 + size]
    if lvl.any():
        d = tx.dequantize_np(lvl[None], qp, log2, bd, m=m)[0]
        r = tx.inverse_transform_np(d[None], bd, is_dst)[0]
        rec = np.clip(pred + r, 0, (1 << bd) - 1)
    else:
        rec = pred
    plane[y0 : y0 + size, x0 : x0 + size] = rec


def _walk(fs, sps, qp, planes, origs, sdh, rdoq, lam_fp, encode):
    bd = sps.bit_depth
    order = (getattr(fs, "tile_order8", None)
             or BlockOrder(fs.width, fs.height, sps.log2_ctu))
    from .native_intra import intra_walk_native

    # general features (NxN PUs / TU splits / the PCM candidate) take
    # the generalized walk; the native fast path covers the TU = CU,
    # 2Nx2N subset
    pcm_on = bool(encode and sps.pcm_enabled)
    sl = bool(getattr(sps, "scaling_list_enabled", False))
    general = pcm_on or sl or bool(fs.nxn.any()) or bool(
        (fs.tu_log2 >= 0).any() and _has_real_tusplit(fs))
    if not general and intra_walk_native(
            fs, sps, qp, planes, origs if encode else None,
            sdh, rdoq, lam_fp, order):
        return
    qpc = chroma_qp(qp)
    y, u, v = planes
    oy, ou, ov = origs if origs else (None, None, None)
    from .recon import _chroma_mode_resolver

    resolve = _chroma_mode_resolver(fs)
    order4 = None
    if general:
        order4 = (getattr(fs, "tile_order4", None)
                  or BlockOrder(fs.width, fs.height, sps.log2_ctu,
                                cell_log2=2))
    est_by = {}
    wch = 2.0 ** ((qp - qpc) / 3.0)
    if encode:
        fb_arb = FracBits(I_ROW, qp)
        lam_arb = lam_fp / 256.0

        def _est(l2, luma):
            key = (l2, luma)
            if key not in est_by:
                est_by[key] = ResidualBitEst(fb_arb, l2, luma)
            return est_by[key]
    else:
        def _est(l2, luma):
            return None

    def _e(sz, luma):
        return _est(sz.bit_length() - 1, luma) if encode else None

    def code_cu(x8, y8, log2, split, measure=False):
        """Code one CU (in place). With measure=True returns the real
        RD cost: SSE vs orig (chroma HM-weighted) + lambda * estimator
        bits of the coded levels (the closed-loop arbiter's metric)."""
        s = 1 << log2
        x0, y0 = x8 * 8, y8 * 8
        mode = int(fs.luma_mode[y8, x8])
        cmode = resolve(x8, y8)
        nxn = split and bool(fs.nxn[y8, x8]) and log2 == sps.log2_min_cu
        bits = 0.0
        if not split:
            _code_tb(y, fs.coeff_y, oy, x0, y0, s, mode, order, qp,
                     True, bd, sps.strong_intra_smoothing, sdh, rdoq,
                     lam_fp, 8, encode, sl, est=_e(s, True))
            if measure:
                lv = fs.coeff_y[y0 : y0 + s, x0 : x0 + s]
                bits += float(_est(log2, True).tu_bits(np, lv[None])[0]) \
                    if lv.any() else 0.0
            cs = max(4, s // 2)
            for pl, opl, cf in ((u, ou, fs.coeff_cb), (v, ov, fs.coeff_cr)):
                _code_tb(pl, cf, opl, x8 * 4, y8 * 4, cs, cmode, order,
                         qpc, False, bd, False, sdh, rdoq, lam_fp, 4,
                         encode, sl, est=_e(cs, False),
                         lam_scale=1.0 / wch)
                if measure:
                    lv = cf[y8 * 4 : y8 * 4 + cs, x8 * 4 : x8 * 4 + cs]
                    if lv.any():
                        bits += float(_est(cs.bit_length() - 1, False)
                                      .tu_bits(np, lv[None])[0])
            return bits
        # one-level split (NxN IntraSplit or explicit TU split): 4 luma
        # sub-TBs in z-order, then the chroma TBs (planes independent)
        half = s // 2
        offs = ((0, 0), (half, 0), (0, half), (half, half))
        for dx, dy in offs:
            m = (int(fs.luma_mode4[(y0 + dy) // 4, (x0 + dx) // 4])
                 if nxn else mode)
            lorder, lcell = (order4, 4) if half == 4 else (order, 8)
            _code_tb(y, fs.coeff_y, oy, x0 + dx, y0 + dy, half, m,
                     lorder, qp, True, bd, sps.strong_intra_smoothing,
                     sdh, rdoq, lam_fp, lcell, encode, sl,
                     est=_e(half, True))
            if measure:
                lv = fs.coeff_y[y0 + dy : y0 + dy + half,
                                x0 + dx : x0 + dx + half]
                if lv.any():
                    bits += float(_est(half.bit_length() - 1, True)
                                  .tu_bits(np, lv[None])[0])
        # resolve() already maps DM -> fs.luma_mode (PU0's mode for NxN)
        amode = cmode
        if s == 8:
            # chroma stays one 4x4 TB at the CU level (§7.3.8.8)
            for pl, opl, cf in ((u, ou, fs.coeff_cb), (v, ov, fs.coeff_cr)):
                _code_tb(pl, cf, opl, x8 * 4, y8 * 4, 4, amode, order,
                         qpc, False, bd, False, sdh, rdoq, lam_fp, 4,
                         encode, sl, est=_e(4, False),
                         lam_scale=1.0 / wch)
                if measure:
                    lv = cf[y8 * 4 : y8 * 4 + 4, x8 * 4 : x8 * 4 + 4]
                    if lv.any():
                        bits += float(_est(2, False)
                                      .tu_bits(np, lv[None])[0])
        else:
            chalf = half // 2
            for dx, dy in offs:
                for pl, opl, cf in ((u, ou, fs.coeff_cb),
                                    (v, ov, fs.coeff_cr)):
                    _code_tb(pl, cf, opl, x0 // 2 + dx // 2,
                             y0 // 2 + dy // 2, chalf, amode, order, qpc,
                             False, bd, False, sdh, rdoq, lam_fp, 4,
                             encode, sl, est=_e(chalf, False),
                             lam_scale=1.0 / wch)
                    if measure:
                        cy0, cx0 = y0 // 2 + dy // 2, x0 // 2 + dx // 2
                        lv = cf[cy0 : cy0 + chalf, cx0 : cx0 + chalf]
                        if lv.any():
                            bits += float(
                                _est(chalf.bit_length() - 1, False)
                                .tu_bits(np, lv[None])[0])
        return bits

    def try_pcm(x8, y8, log2, cost_coded):
        """PCM candidate (TEncCu::xCheckIntraPCM, TEncCu.cpp:1410): raw
        samples beat the coded CU when lambda * raw bits < its RD cost.
        Returns True when PCM was taken (planes/maps updated)."""
        if not (pcm_on and sps.pcm_log2_min <= log2 <= sps.pcm_log2_max):
            return False
        s = 1 << log2
        x0, y0 = x8 * 8, y8 * 8
        cs = s // 2
        pbd = sps.pcm_bit_depth
        sh = bd - pbd
        raw_bits = pbd * (s * s + 2 * cs * cs) + 8.0  # + flag/align
        oy_b = oy[y0 : y0 + s, x0 : x0 + s].astype(np.int32)
        ou_b = ou[y0 // 2 : y0 // 2 + cs, x0 // 2 : x0 // 2 + cs] \
            .astype(np.int32)
        ov_b = ov[y0 // 2 : y0 // 2 + cs, x0 // 2 : x0 // 2 + cs] \
            .astype(np.int32)
        ry_ = (oy_b >> sh) << sh
        ru_ = (ou_b >> sh) << sh
        rv_ = (ov_b >> sh) << sh
        d = (float(((oy_b - ry_).astype(np.float64) ** 2).sum())
             + wch * (float(((ou_b - ru_).astype(np.float64) ** 2).sum())
                      + float(((ov_b - rv_).astype(np.float64) ** 2)
                              .sum())))
        if d + lam_arb * raw_bits >= cost_coded:
            return False
        y[y0 : y0 + s, x0 : x0 + s] = ry_
        u[y0 // 2 : y0 // 2 + cs, x0 // 2 : x0 // 2 + cs] = ru_
        v[y0 // 2 : y0 // 2 + cs, x0 // 2 : x0 // 2 + cs] = rv_
        fs.coeff_y[y0 : y0 + s, x0 : x0 + s] = 0
        fs.coeff_cb[y0 // 2 : y0 // 2 + cs, x0 // 2 : x0 // 2 + cs] = 0
        fs.coeff_cr[y0 // 2 : y0 // 2 + cs, x0 // 2 : x0 // 2 + cs] = 0
        fs.pcm_blocks[(x8, y8)] = (ry_, ru_, rv_)
        s4 = s // 4
        fs.tu_log2[y0 // 4 : y0 // 4 + s4, x0 // 4 : x0 // 4 + s4] = -1
        if log2 == sps.log2_min_cu:
            fs.nxn[y8, x8] = 0
        return True

    for x8, y8 in _cu_roots(fs.cu_log2, order):
        log2 = int(fs.cu_log2[y8, x8])
        s = 1 << log2
        x0, y0 = x8 * 8, y8 * 8
        nxn = bool(fs.nxn[y8, x8]) and log2 == sps.log2_min_cu
        want = int(fs.tu_log2[y8 * 2, x8 * 2])
        split = nxn or (0 <= want < log2)
        if not (encode and split):
            if pcm_on and encode:
                cs2 = s // 2
                yx = np.s_[y0 : y0 + s, x0 : x0 + s]
                cyx = np.s_[y0 // 2 : y0 // 2 + cs2,
                            x0 // 2 : x0 // 2 + cs2]
                b_c = code_cu(x8, y8, log2, split, measure=True)
                dy_ = float(((y[yx] - oy[yx]).astype(np.float64)
                             ** 2).sum())
                du_ = float(((u[cyx] - ou[cyx]).astype(np.float64)
                             ** 2).sum())
                dv_ = float(((v[cyx] - ov[cyx]).astype(np.float64)
                             ** 2).sum())
                try_pcm(x8, y8, log2,
                        dy_ + wch * (du_ + dv_) + lam_arb * b_c)
            else:
                code_cu(x8, y8, log2, split)
            continue
        # closed-loop arbitration: the open-loop pass flagged a split
        # variant (NxN / one-level RQT); code BOTH against the real
        # reconstruction refs and keep the measured-RD winner (counters
        # the small-TB bias of original-pixel references)
        cs2 = s // 2
        yx = np.s_[y0 : y0 + s, x0 : x0 + s]
        cyx = np.s_[y0 // 2 : y0 // 2 + cs2, x0 // 2 : x0 // 2 + cs2]
        snap = (y[yx].copy(), u[cyx].copy(), v[cyx].copy(),
                fs.coeff_y[yx].copy(), fs.coeff_cb[cyx].copy(),
                fs.coeff_cr[cyx].copy())

        def cu_cost(bits, nflags):
            dy_ = float(((y[yx] - oy[yx]).astype(np.float64) ** 2).sum())
            du_ = float(((u[cyx] - ou[cyx]).astype(np.float64) ** 2).sum())
            dv_ = float(((v[cyx] - ov[cyx]).astype(np.float64) ** 2).sum())
            return dy_ + wch * (du_ + dv_) + lam_arb * (bits + nflags)

        cbf1 = fb_arb.b("qt_cbf", 1, 1)
        cbf0s = fb_arb.b("qt_cbf", 0, 1)
        b_a = code_cu(x8, y8, log2, False, measure=True)
        cost_a = cu_cost(b_a, cbf1)  # one depth-0 luma cbf
        plain = (y[yx].copy(), u[cyx].copy(), v[cyx].copy(),
                 fs.coeff_y[yx].copy(), fs.coeff_cb[cyx].copy(),
                 fs.coeff_cr[cyx].copy())
        # restore and code the split variant
        (y[yx], u[cyx], v[cyx], fs.coeff_y[yx], fs.coeff_cb[cyx],
         fs.coeff_cr[cyx]) = snap
        # syntax-overhead estimate of the split variant: NxN pays 3 more
        # luma-mode payloads (~4 bits each); the RQT split pays its flag
        extra = 12.0 if nxn else 1.0
        b_b = code_cu(x8, y8, log2, True, measure=True)
        cost_b = cu_cost(b_b, 4 * cbf0s + extra)
        if cost_a <= cost_b:
            # plain wins: restore its result + clear the split flags
            (y[yx], u[cyx], v[cyx], fs.coeff_y[yx], fs.coeff_cb[cyx],
             fs.coeff_cr[cyx]) = plain
            s4 = s // 4
            y4, x4 = y0 // 4, x0 // 4
            fs.tu_log2[y4 : y4 + s4, x4 : x4 + s4] = -1
            if nxn:
                fs.nxn[y8, x8] = 0
                fs.luma_mode4[y4 : y4 + s4, x4 : x4 + s4] = \
                    fs.luma_mode[y8, x8]
        try_pcm(x8, y8, log2, min(cost_a, cost_b))


def _has_real_tusplit(fs) -> bool:
    """True if any CU's recorded leaf TB is smaller than the CU."""
    h8, w8 = fs.cu_log2.shape
    t = fs.tu_log2[: h8 * 2 : 2, : w8 * 2 : 2]
    return bool(((t >= 0) & (t < fs.cu_log2)).any())


def _apply_maps(fs, cu_log2, lm8, cm8, nxn, lm4, tsp8):
    """Bind decided partition/mode maps onto a FrameSyntax."""
    cu_log2 = np.asarray(cu_log2)
    fs.cu_log2 = cu_log2.astype(np.int8)
    fs.luma_mode = np.asarray(lm8).astype(np.int8)
    fs.chroma_mode = np.asarray(cm8).astype(np.int8)
    if nxn is not None:
        nxn = np.asarray(nxn)
        tsp8 = np.asarray(tsp8)
        fs.nxn = nxn.astype(np.int8)
        fs.luma_mode4 = np.asarray(lm4).astype(np.int8)
        # leaf TB log2 per 4-cell: -1 = TU = CU; split CUs one level
        # down; NxN = 4x4 TBs (IntraSplit)
        rep = np.repeat(np.repeat(cu_log2, 2, 0), 2, 1).astype(np.int8)
        t4 = np.where(np.repeat(np.repeat(tsp8, 2, 0), 2, 1),
                      rep - 1, np.int8(-1))
        t4 = np.where(np.repeat(np.repeat(nxn > 0, 2, 0), 2, 1),
                      np.int8(2), t4)
        fs.tu_log2 = t4.astype(np.int8)


def encode_frame_intra_qt(orig_y, orig_u, orig_v, cfg: EncoderConfig):
    """Quadtree all-intra encode of one frame. Same contract as
    recon.encode_frame_intra: returns (FrameSyntax, (y, u, v))."""
    from ..entropy.syntax import FrameSyntax
    from .recon import _pad_to

    sps, qp = cfg.sps, cfg.qp
    w, h = sps.coded_width, sps.coded_height
    oy = _pad_to(orig_y, h, w)
    ou = _pad_to(orig_u, h // 2, w // 2)
    ov = _pad_to(orig_v, h // 2, w // 2)

    def _decide(ref_planes=None):
        if cfg.inter_backend == "jax":
            from .intra_decide_jax import decide_intra_qt_jax

            maps = decide_intra_qt_jax(oy, ou, ov, cfg, qp,
                                       ref_planes=ref_planes)
        else:
            maps = decide_intra_qt(oy, ou, ov, cfg, qp,
                                   ref_planes=ref_planes)
        cu_log2, lm8, cm8, nxn, lm4, tsp8 = maps
        use_nxn = cfg.intra_nxn
        if use_nxn is None:
            use_nxn = cfg.intra_period == 1  # auto (see params.intra_nxn)
        if not use_nxn:
            nxn = np.zeros_like(np.asarray(nxn))
            tsp8 = np.zeros_like(np.asarray(tsp8))
            lm4 = np.repeat(np.repeat(np.asarray(lm8), 2, 0), 2, 1)
        return cu_log2, lm8, cm8, nxn, lm4, tsp8

    cu_log2, lm8, cm8, nxn, lm4, tsp8 = _decide()

    fs = FrameSyntax(w, h)
    if cfg.pps.tiles_enabled or cfg.slice_ctus > 0:
        from .tiles import block_order_for

        fs.tile_order8 = block_order_for(sps, cfg.pps,
                                         slice_ctus=cfg.slice_ctus)
        fs.tile_order4 = block_order_for(sps, cfg.pps, cell_log2=2,
                                         slice_ctus=cfg.slice_ctus)
    _apply_maps(fs, cu_log2, lm8, cm8, nxn, lm4, tsp8)
    y = np.zeros((h, w), np.int32)
    u = np.zeros((h // 2, w // 2), np.int32)
    v = np.zeros((h // 2, w // 2), np.int32)
    from .params import i_frame_lambda

    lam_fp = int(round(i_frame_lambda(cfg, qp) * 256))
    _walk(fs, sps, qp, (y, u, v), (oy, ou, ov),
          cfg.pps.sign_data_hiding, cfg.rdoq, lam_fp, True)

    if cfg.intra_two_pass:
        # pass 2: re-decide with pass-1 recon as the open-loop reference
        # source. Clean original refs flatter LARGE blocks' neighbors
        # less than they flatter small blocks' near refs, biasing the
        # size compare toward 8-CUs; quantized refs restore the balance
        # the closed-loop walk will actually see. One extra decide +
        # walk on the (rare in LD-P) intra frame.
        cu_log2, lm8, cm8, nxn, lm4, tsp8 = _decide(ref_planes=(y, u, v))
        _apply_maps(fs, cu_log2, lm8, cm8, nxn, lm4, tsp8)
        y[:], u[:], v[:] = 0, 0, 0
        fs.coeff_y[:] = 0
        fs.coeff_cb[:] = 0
        fs.coeff_cr[:] = 0
        _walk(fs, sps, qp, (y, u, v), (oy, ou, ov),
              cfg.pps.sign_data_hiding, cfg.rdoq, lam_fp, True)
    return fs, (y, u, v)


def reconstruct_frame_qt(fs, sps, qp: int):
    """Decoder-side reconstruction for quadtree intra frames (exact
    mirror of the coding walk)."""
    y = np.zeros((fs.height, fs.width), np.int32)
    u = np.zeros((fs.height // 2, fs.width // 2), np.int32)
    v = np.zeros((fs.height // 2, fs.width // 2), np.int32)
    _walk(fs, sps, qp, (y, u, v), None, False, False, 256, False)
    return y, u, v
