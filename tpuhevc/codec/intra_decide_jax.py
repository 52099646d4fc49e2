"""Device (JAX) open-loop quadtree intra decision — jitted twin of
codec.intra_qt.decide_intra_qt.

Same two-stage shape as the reference's estIntraPredLumaQT
(TEncSearch.cpp:2945: SATD prescreen over all 35 modes, full RD on the
survivors) but fully batched per size class so the whole pass is a few
large MXU einsums instead of HM's per-PU recursion. The one sequential
ingredient of the host twin — the raster MPM-aware final pick — is
replaced by a two-iteration vectorized relaxation (neighbor modes from
the previous iteration's picks), which converges to the same choices in
practice; the decision is encoder-only so conformance is untouched
(coding happens in intra_qt._walk against spec refs either way).

Returns the same (cu_log2, lm8, cm8) 8x8-cell maps as the host twin.
"""

from __future__ import annotations

import functools

import numpy as np

from ..entropy.bitest import FracBits, ResidualBitEst
from ..ops import transforms as tx
from ..utils.tables import chroma_qp
from .intra_qt import I_ROW, _mode_bits_tab


def _hadamard8():
    from ..ops.cost import hadamard

    return hadamard(8).astype(np.float32)


def _hadamard4():
    from ..ops.cost import hadamard

    return hadamard(4).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _build(h, w, qp, bd, rdoq, strong, lam_q8, tusplit_on=True,
           nxn_on=True):
    import jax
    import jax.numpy as jnp

    lam = lam_q8 / 256.0
    lam_fp = lam_q8
    fb = FracBits(I_ROW, qp)
    mpm0_b, mpm12_b, esc_b = _mode_bits_tab(fb)
    split_b = [fb.b("split_cu_flag", 1, v) for v in (0, 1)]
    part_b = fb.b("part_mode", 0, 1)
    part_nxn_b = fb.b("part_mode", 0, 0)
    cbf1_b = fb.b("qt_cbf", 1, 1)
    cbf0_b = fb.b("qt_cbf", 1, 0)
    scbf1_b = fb.b("qt_cbf", 0, 1)
    scbf0_b = fb.b("qt_cbf", 0, 0)
    ccbf_b = fb.b("qt_cbf", 5, 0)
    dm_b = fb.b("intra_chroma_pred_mode", 0, 0)
    ex_b = fb.b("intra_chroma_pred_mode", 0, 1) + 2.0
    qpc = chroma_qp(qp)
    wch = 2.0 ** ((qp - qpc) / 3.0)
    Hf = jnp.asarray(_hadamard8())
    H4 = jnp.asarray(_hadamard4())

    def refs(plane, S, nh, nw):
        pp = jnp.pad(plane, ((1, 2 * S), (1, 2 * S)), mode="edge")
        ys = (jnp.arange(nh) * S)[:, None, None]
        xs = (jnp.arange(nw) * S)[None, :, None]
        rng = jnp.arange(2 * S + 1)[None, None, :]
        tops = pp[ys + 0, xs + rng].reshape(nh * nw, -1).astype(jnp.int32)
        lefts = pp[ys + rng, xs + 0].reshape(nh * nw, -1).astype(jnp.int32)
        return tops, lefts

    def satd35(org, preds, N, S):
        dd = (org[:, None] - preds).astype(jnp.float32)
        if S >= 8:
            t8 = dd.reshape(N, 35, S // 8, 8, S // 8, 8).transpose(
                0, 1, 2, 4, 3, 5).reshape(-1, 8, 8)
            m = Hf @ t8 @ Hf.T
            return ((jnp.abs(m).sum((1, 2)) + 2) // 4).reshape(
                N, 35, -1).sum(-1)
        m = H4 @ dd.reshape(-1, 4, 4) @ H4.T
        return ((jnp.abs(m).sum((1, 2)) + 1) // 2).reshape(N, 35)

    def txq(resi, q, log2, est, is_dst=False):
        c = tx.forward_transform(resi, bd, is_dst)
        if rdoq:
            lvl = tx.rdoq_est_xp(jnp, c, q, log2, bd,
                                 lam / (wch if q == qpc else 1.0), est)
        else:
            lvl = tx.quantize(c, q, log2, bd, True)
        d = tx.dequantize(lvl, q, log2, bd)
        r = tx.inverse_transform(d, bd, is_dst)
        err = (resi - r).astype(jnp.float32)
        dist = (err * err).sum(axis=(1, 2))
        bits = est.tu_bits(jnp, lvl)
        return dist, bits

    def mpm3(a, b):
        """Vectorized candModeList (tables.intra_mpm_list)."""
        eq = a == b
        lt2 = a < 2
        m0 = jnp.where(eq & lt2, 0, a)
        m1 = jnp.where(eq, jnp.where(lt2, 1, 2 + ((a + 29) % 32)), b)
        third = jnp.where((a != 0) & (b != 0), 0,
                          jnp.where((a != 1) & (b != 1), 1, 26))
        m2 = jnp.where(eq, jnp.where(lt2, 26, 2 + ((a - 1) % 32)), third)
        return m0, m1, m2

    def mode_bits(m, m0, m1, m2):
        return jnp.where(m == m0, mpm0_b,
                         jnp.where((m == m1) | (m == m2), mpm12_b, esc_b))

    def luma_rd(oy, ry, S, nh, nw, nc):
        """SATD prescreen + full RD over the top nc candidates.
        Returns (topk, rd_d, rd_b, preds, org). ry: the reference-sample
        source plane (pass 1: the original; pass 2: pass-1 recon, so the
        open-loop size compare sees quantized refs like the closed-loop
        walk will)."""
        from ..ops.intra import predict_all_modes

        log2 = S.bit_length() - 1
        N = nh * nw
        tops, lefts = refs(ry, S, nh, nw)
        preds = predict_all_modes(tops, lefts, S, True, bd, strong)
        org = oy[: nh * S, : nw * S].reshape(nh, S, nw, S).transpose(
            0, 2, 1, 3).reshape(N, S, S).astype(jnp.int32)
        sat = satd35(org, preds, N, S)
        _, topk = jax.lax.top_k(-sat, nc)  # (N, nc)

        est = ResidualBitEst(fb, log2, True)
        rd_d = []
        rd_b = []
        for k in range(nc):
            sel = jnp.take_along_axis(
                preds, topk[:, k][:, None, None, None], axis=1)[:, 0]
            dist, rbits = txq(org - sel, qp, log2, est, is_dst=(S == 4))
            d0f = (org - sel).astype(jnp.float32)
            d0 = (d0f * d0f).sum(axis=(1, 2))
            use = dist + lam * (rbits + cbf1_b) < d0 + lam * cbf0_b
            rd_d.append(jnp.where(use, dist, d0))
            rd_b.append(jnp.where(use, rbits + cbf1_b, cbf0_b))
        rd_d = jnp.stack(rd_d, 1)  # (N, nc)
        rd_b = jnp.stack(rd_b, 1)
        return topk, rd_d, rd_b, preds, org

    def luma_class(oy, ry, S, nh, nw):
        nc = 8 if S <= 8 else 3  # g_aucIntraModeNumFast_UseMPM
        topk, rd_d, rd_b, preds, org = luma_rd(oy, ry, S, nh, nw, nc)

        # MPM-aware pick: 2-iteration relaxation over neighbor modes
        m2d = topk[:, 0].reshape(nh, nw)
        pick = None
        for _ in range(2):
            lm = jnp.concatenate(
                [jnp.full((nh, 1), 1, m2d.dtype), m2d[:, :-1]], 1)
            am = jnp.concatenate(
                [jnp.full((1, nw), 1, m2d.dtype), m2d[:-1]], 0)
            m0, m1, m2 = (x.reshape(-1) for x in mpm3(lm, am))
            mb = jnp.stack([mode_bits(topk[:, k], m0, m1, m2)
                            for k in range(nc)], 1)  # (N, nc)
            cst = rd_d + lam * (rd_b + mb)
            pick = jnp.argmin(cst, 1)
            m2d = jnp.take_along_axis(topk, pick[:, None], 1)[:, 0] \
                .reshape(nh, nw)
        mode_sel = m2d.reshape(-1)
        dL = jnp.take_along_axis(rd_d, pick[:, None], 1)[:, 0]
        bL = (jnp.take_along_axis(rd_b, pick[:, None], 1)[:, 0]
              + jnp.take_along_axis(mb, pick[:, None], 1)[:, 0])
        mbL = jnp.take_along_axis(mb, pick[:, None], 1)[:, 0]
        return mode_sel, dL, bL, mbL, preds, org

    def tsplit_cost(S, m2d, nh, nw, preds_h, org_h):
        """Luma cost of one-level TU split under the parent mode
        (open-loop child predictions at their own boundaries)."""
        C = S // 2
        log2c_ = C.bit_length() - 1
        nh2, nw2 = h // C, w // C
        est2 = ResidualBitEst(fb, log2c_, True)
        mrep = m2d.reshape(-1)
        by, bx = jnp.meshgrid(jnp.arange(nh), jnp.arange(nw),
                              indexing="ij")
        d_sum = jnp.zeros(nh * nw)
        b_sum = jnp.zeros(nh * nw)
        for dy in (0, 1):
            for dx in (0, 1):
                idx = ((by * 2 + dy) * nw2 + (bx * 2 + dx)).reshape(-1)
                sel = jnp.take_along_axis(
                    preds_h[idx], mrep[:, None, None, None], axis=1)[:, 0]
                orgc = org_h[idx]
                dist, rbits = txq(orgc - sel, qp, log2c_, est2,
                                  is_dst=(C == 4))
                d0f = (orgc - sel).astype(jnp.float32)
                d0 = (d0f * d0f).sum(axis=(1, 2))
                use = dist + lam * (rbits + scbf1_b) < d0 + lam * scbf0_b
                d_sum = d_sum + jnp.where(use, dist, d0)
                b_sum = b_sum + jnp.where(use, rbits + scbf1_b, scbf0_b)
        return d_sum, b_sum

    def chroma_class(ou, ov, ru, rv, S, nh, nw, mode_sel):
        from ..ops.intra import predict_all_modes

        N = nh * nw
        Sc = max(4, S // 2)
        log2c = Sc.bit_length() - 1
        cest = ResidualBitEst(fb, log2c, False)
        cd_by = jnp.zeros((N, 5))
        cb_by = jnp.zeros((N, 5))
        for plane, rplane in ((ou, ru), (ov, rv)):
            ctops, clefts = refs(rplane, Sc, nh, nw)
            cpreds = predict_all_modes(ctops, clefts, Sc, False, bd, False)
            corg = plane[: nh * Sc, : nw * Sc].reshape(
                nh, Sc, nw, Sc).transpose(0, 2, 1, 3).reshape(
                N, Sc, Sc).astype(jnp.int32)
            pd = []
            pb = []
            for ci in range(5):
                if ci == 4:
                    am = mode_sel
                else:
                    base = (0, 26, 10, 1)[ci]
                    am = jnp.where(mode_sel == base, 34, base)
                cpsel = jnp.take_along_axis(
                    cpreds, am[:, None, None, None], axis=1)[:, 0]
                cd, cb = txq(corg - cpsel, qpc, log2c, cest)
                c0f = (corg - cpsel).astype(jnp.float32)
                cd0 = (c0f * c0f).sum(axis=(1, 2))
                cuse = wch * cd + lam * cb < wch * cd0
                pd.append(jnp.where(cuse, cd, cd0))
                pb.append(jnp.where(cuse, cb, 0.0))
            cd_by = cd_by + jnp.stack(pd, 1)
            cb_by = cb_by + jnp.stack(pb, 1)
        mbv = jnp.asarray([ex_b, ex_b, ex_b, ex_b, dm_b])
        ccost = wch * cd_by + lam * (cb_by + mbv[None])
        csel = jnp.argmin(ccost, 1)
        cbest = jnp.take_along_axis(ccost, csel[:, None], 1)[:, 0]
        return csel, cbest

    def fn(oy, ou, ov, ry, ru, rv):
        h8, w8 = h // 8, w // 8
        cost_tree = {}
        mode_by = {}
        cmode_by = {}
        tsp_by = {}
        preds_of = {}
        org_of = {}
        # 4x4 PU class for the NxN trial (+ the 8-CU TU-split children)
        if nxn_on or tusplit_on:
            topk4, rdd4, rdb4, preds4, org4 = luma_rd(
                oy, ry, 4, h // 4, w // 4, 8)
            preds_of[4], org_of[4] = preds4, org4
        nxn_modes = None
        use_nxn = None
        for S in (8, 16, 32):
            nh, nw = h // S, w // S
            if nh == 0 or nw == 0:
                cost_tree[S] = None
                continue
            mode_sel, dL, bL, mbL, predsS, orgS = luma_class(
                oy, ry, S, nh, nw)
            preds_of[S], org_of[S] = predsS, orgS
            # one-level TU split under the winner mode (RQT trial)
            tsp = jnp.zeros((nh, nw), bool)
            if tusplit_on:
                d2, b2 = tsplit_cost(S, mode_sel, nh, nw,
                                     preds_of[S // 2], org_of[S // 2])
                sdelta = (fb.b("split_transform_flag", 5 - S.bit_length()
                               + 1, 1)
                          - fb.b("split_transform_flag",
                                 5 - S.bit_length() + 1, 0))
                c_cu = dL + lam * bL
                c_sp = d2 + lam * (b2 + sdelta + mbL)
                tspf = c_sp < c_cu
                tsp = tspf.reshape(nh, nw)
                dL = jnp.where(tspf, d2, dL)
                bL = jnp.where(tspf, b2 + sdelta + mbL, bL)
            tsp_by[S] = tsp
            csel, cbest = chroma_class(ou, ov, ru, rv, S, nh, nw,
                                       mode_sel)
            cost = dL + cbest + lam * (bL + 2 * ccbf_b + 1.0)
            if S == 8:
                cost = cost + lam * part_b
            if S == 8 and nxn_on:
                # NxN trial: 4 PUs pick from the 4x4 top-8; MPM chain
                # through the CU's own PUs, outside neighbors from the
                # 8-level winner map
                m8 = mode_sel.reshape(nh, nw)
                lm_out = jnp.concatenate(
                    [jnp.full((nh, 1), 1, m8.dtype), m8[:, :-1]],
                    1).reshape(-1)
                am_out = jnp.concatenate(
                    [jnp.full((1, nw), 1, m8.dtype), m8[:-1]],
                    0).reshape(-1)
                nw4 = w // 4
                byg, bxg = jnp.meshgrid(jnp.arange(nh), jnp.arange(nw),
                                        indexing="ij")
                pm = [None] * 4
                pud = jnp.zeros(nh * nw)
                pub = jnp.zeros(nh * nw)
                for q, (dx, dy) in enumerate(
                        ((0, 0), (1, 0), (0, 1), (1, 1))):
                    idx = ((byg * 2 + dy) * nw4
                           + (bxg * 2 + dx)).reshape(-1)
                    left_m = pm[q - 1] if dx else lm_out
                    above_m = pm[q - 2] if dy else am_out
                    m0, m1, m2 = mpm3(left_m, above_m)
                    tk = topk4[idx]
                    mb4 = jnp.stack(
                        [mode_bits(tk[:, k], m0, m1, m2)
                         for k in range(tk.shape[1])], 1)
                    cst = rdd4[idx] + lam * (rdb4[idx] + mb4)
                    pick = jnp.argmin(cst, 1)
                    pm[q] = jnp.take_along_axis(tk, pick[:, None],
                                                1)[:, 0]
                    pud = pud + jnp.take_along_axis(
                        rdd4[idx], pick[:, None], 1)[:, 0]
                    pub = pub + (jnp.take_along_axis(
                        rdb4[idx], pick[:, None], 1)[:, 0]
                        + jnp.take_along_axis(mb4, pick[:, None],
                                              1)[:, 0])
                cost_nxn = (pud + cbest
                            + lam * (pub + 2 * ccbf_b + 1.0
                                     + part_nxn_b))
                use_nxn = (cost_nxn < cost).reshape(nh, nw)
                nxn_modes = [p.reshape(nh, nw) for p in pm]
                cost = jnp.minimum(cost, cost_nxn)
            cost_tree[S] = cost.reshape(nh, nw)
            mode_by[S] = mode_sel.reshape(nh, nw)
            cmode_by[S] = csel.reshape(nh, nw)

        cu_log2 = jnp.full((h8, w8), 3, jnp.int8)
        lm8 = mode_by[8].astype(jnp.int8)
        cm8 = cmode_by[8].astype(jnp.int8)
        tsp8 = tsp_by[8]
        t16 = None
        if cost_tree.get(16) is not None:
            nh16, nw16 = h // 16, w // 16
            tree8 = cost_tree[8]
            sum8 = tree8[: nh16 * 2, : nw16 * 2].reshape(
                nh16, 2, nw16, 2).sum((1, 3))
            c16 = cost_tree[16] + lam * split_b[0]
            s16 = sum8 + lam * split_b[1]
            keep16 = s16 >= c16
            t16 = jnp.minimum(c16, s16)

            def up2(m, fill_h, fill_w):
                e = jnp.repeat(jnp.repeat(m, 2, 0), 2, 1)
                return jnp.pad(e, ((0, fill_h), (0, fill_w)),
                               mode="edge") if (fill_h or fill_w) else e

            k16 = up2(keep16, h8 - nh16 * 2, w8 - nw16 * 2)
            # cells beyond the 16-block cover stay 8
            k16 = k16.at[nh16 * 2:].set(False) if h8 > nh16 * 2 else k16
            k16 = k16.at[:, nw16 * 2:].set(False) if w8 > nw16 * 2 else k16
            cu_log2 = jnp.where(k16, 4, cu_log2).astype(jnp.int8)
            lm8 = jnp.where(k16, up2(mode_by[16], h8 - nh16 * 2,
                                     w8 - nw16 * 2), lm8).astype(jnp.int8)
            cm8 = jnp.where(k16, up2(cmode_by[16], h8 - nh16 * 2,
                                     w8 - nw16 * 2), cm8).astype(jnp.int8)
            tsp8 = jnp.where(k16, up2(tsp_by[16], h8 - nh16 * 2,
                                      w8 - nw16 * 2), tsp8)
        if cost_tree.get(32) is not None and t16 is not None:
            nh32, nw32 = h // 32, w // 32
            sum16 = t16[: nh32 * 2, : nw32 * 2].reshape(
                nh32, 2, nw32, 2).sum((1, 3))
            c32 = cost_tree[32] + lam * split_b[0]
            s32 = sum16 + lam * split_b[1]
            keep32 = s32 >= c32

            def up4(m):
                e = jnp.repeat(jnp.repeat(m, 4, 0), 4, 1)
                return jnp.pad(e, ((0, h8 - nh32 * 4), (0, w8 - nw32 * 4)),
                               mode="edge")

            k32 = up4(keep32)
            k32 = k32.at[nh32 * 4:].set(False) if h8 > nh32 * 4 else k32
            k32 = k32.at[:, nw32 * 4:].set(False) if w8 > nw32 * 4 else k32
            cu_log2 = jnp.where(k32, 5, cu_log2).astype(jnp.int8)
            lm8 = jnp.where(k32, up4(mode_by[32]), lm8).astype(jnp.int8)
            cm8 = jnp.where(k32, up4(cmode_by[32]), cm8).astype(jnp.int8)
            tsp8 = jnp.where(k32, up4(tsp_by[32]), tsp8)
        # NxN winners at surviving min-size CUs
        if use_nxn is None:
            use_nxn = jnp.zeros((h8, w8), bool)
            nxn_modes = [lm8] * 4
        nxn = (cu_log2 == 3) & use_nxn
        lm4 = jnp.repeat(jnp.repeat(lm8, 2, 0), 2, 1).astype(jnp.int8)
        pm0 = jnp.where(nxn, nxn_modes[0].astype(jnp.int8), lm8)
        lm8 = pm0.astype(jnp.int8)
        h4, w4 = h // 4, w // 4
        n2 = jnp.repeat(jnp.repeat(nxn, 2, 0), 2, 1)
        pugrid = jnp.zeros((h4, w4), jnp.int8)
        pugrid = pugrid.at[0::2, 0::2].set(nxn_modes[0].astype(jnp.int8))
        pugrid = pugrid.at[0::2, 1::2].set(nxn_modes[1].astype(jnp.int8))
        pugrid = pugrid.at[1::2, 0::2].set(nxn_modes[2].astype(jnp.int8))
        pugrid = pugrid.at[1::2, 1::2].set(nxn_modes[3].astype(jnp.int8))
        lm4 = jnp.where(n2, pugrid, lm4)
        tsp8 = tsp8 & ~nxn  # IntraSplit carries the 4x4 TBs already
        return cu_log2, lm8, cm8, nxn, lm4, tsp8

    return jax.jit(fn)


def decide_intra_qt_jax(oy, ou, ov, cfg, qp: int, ref_planes=None):
    """Device twin of decide_intra_qt: same maps, jitted + cached per
    (size, qp, toolset). ref_planes: optional (ry, ru, rv) open-loop
    reference-sample source (two-pass refinement passes pass-1 recon)."""
    from .params import i_frame_lambda

    sps = cfg.sps
    h, w = oy.shape
    lam = i_frame_lambda(cfg, qp)
    use_nxn = cfg.intra_nxn
    if use_nxn is None:
        use_nxn = cfg.intra_period == 1
    fn = _build(h, w, qp, sps.bit_depth, bool(cfg.rdoq),
                bool(sps.strong_intra_smoothing), int(round(lam * 256)),
                tusplit_on=use_nxn and sps.max_tu_depth_intra >= 1,
                nxn_on=use_nxn)
    ry, ru, rv = ref_planes if ref_planes is not None else (oy, ou, ov)
    cu_log2, lm8, cm8, nxn, lm4, tsp8 = fn(oy, ou, ov, ry, ru, rv)
    return (np.asarray(cu_log2), np.asarray(lm8), np.asarray(cm8),
            np.asarray(nxn), np.asarray(lm4), np.asarray(tsp8))
