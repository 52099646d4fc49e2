"""Plane-level LD-P device stage (v3) for 16-aligned picture sizes.

Whole-frame dense compute shaped for the TPU VPU/MXU (lane dim = picture
width), now with a real RD mode decision:

- hierarchical ME: dense coarse SAD on a 2x sum-pooled pyramid, then a
  7x7 full-pel refinement per block class (8/16/32). The TZ-search
  counterpart (TEncSearch.cpp:4737) restructured as masked dense compute.
- merge-candidate RD sweeps: left/top/left Jacobi passes evaluate the
  neighbor's (mv, ref) as a prediction option and adopt it when
  SSE + lambda*merge_bits beats SSE + lambda*(mvd+ref+mvp bits) — the
  device counterpart of xCheckRDCostMerge2Nx2N / the merge-vs-AMVP
  compare (TEncCu.cpp:455, TEncSearch.cpp:4145), with real CABAC
  fractional-bit estimates (entropy/bitest.py) instead of a Golomb proxy.
- CU quadtree 8/16/32/64: every class residual-coded (TU = min(CU, 32)),
  compared bottom-up with estimated syntax + residual bits
  (xCompressCU's split compare, TEncCu.cpp:726).
- MC via DCT-IF phase planes; transforms as plane einsums; int32 recon
  (fp32 MXU is not integer-exact); float32 for decision costs only.
- no scatters: per-class results live in whole-frame planes composed
  with per-8-cell masks (reshape/where only).
- outputs per frame: composed level/recon planes (or device checksum
  hash) + per-8-cell (cu_log2, mv, ref, cbf) maps for the native
  decode-order walk (native/decision_walk.cpp) that derives
  merge/skip/AMVP syntax exactly as the decoder would.

Interface mirrors inter_batch.build_ldp_scan / collect_frame.
"""

from __future__ import annotations

import numpy as np

from ..utils.tables import chroma_qp, qp_to_lambda
from .params import EncoderConfig, p_frame_lambda

_BUILD_CACHE: dict = {}
_PROBES: dict = {}  # stage closures of the last build (profiling hooks)

# experiment knobs (ablation / debugging; part of the build cache key)
_TUNE = dict(enable8=True, enable64=True, sweep=True, drop=True, zme=True,
             parts=True, fuse_sweep=True,  # bit-identical to per-class
             # sweeps (tools/tune_grid A/B EQUAL on this machine); one
             # lax.scan body instead of three
             tusplit=True,  # one-level inter RQT (TU = CU/2 candidates)
             tusplit2=True,  # second RQT level at 32 CUs (leaves 8,
             # honoring the anchor's QuadtreeTUMaxDepthInter 3)
             rdoq_lastpos=True,  # RDOQ last-position walk-back
             # (TComTrQuant.cpp:2404 batched as cumsums over scan space)
             adaptive_est=True,  # per-chunk context-feedback re-freeze
             # of the decision bit tables (frozen-estimator drift fix)
             merge_rd=True,  # measured-RD merge trial per class
             # (TEncCu.cpp:455-516 counterpart; codes the best spatial
             # neighbor candidate and arbitrates by full RD)
             anchor_left=False,  # ME rate anchored at the left
             # neighbor's coarse winner (AMVP-predictor proxy,
             # getCostOfVectorWithPredictor counterpart) — measured
             # RD-negative on the natural clip like anchor_seed:
             # +5.0% bits for +0.16 dB at QP37; kept as a knob
             anchor_seed=False,  # ME rate anchored at the temporal seed
             # (measured RD-negative on the natural clip: +5% bits for
             # +0.16 dB at QP37 — kept as a knob, off by default)
             # merge adoption bit-weight boost: the sweep compares SATD
             # + lambda_me * syntax bits, but HM's final arbiter is full
             # RD where at high QP the syntax savings dominate; > 1
             # makes the sweep adopt like the full-RD comparison does
             merge_bias=2.0)  # measured at QP37 natural: 2.0 gives
# -2.0% bits for -0.07 dB vs 1.0 (net positive on the ladder slope)


def supports(cfg) -> bool:
    sps = cfg.sps
    return (sps.coded_width % 16 == 0 and sps.coded_height % 16 == 0
            and sps.bit_depth == 8 and not sps.scaling_list_enabled)


def _mvd_bits_np(v):
    """Exp-Golomb-ish bit cost of a quarter-pel mvd component vs zero for
    the SAD-domain ME loop (HM's getCostOfVectorWithPredictor is the same
    kind of log2 approximation; the mode decision uses the real CABAC
    tables instead)."""
    return (2 * np.ceil(np.log2(2 * np.abs(v).astype(np.int64) + 1))
            .astype(np.int32) + 1)


def _xor_mask(h: int, w: int) -> np.ndarray:
    """Per-pixel xor mask of the checksum picture hash (D.3.19)."""
    x = np.arange(w, dtype=np.int32)
    y = np.arange(h, dtype=np.int32)
    return ((x[None, :] & 0xFF) ^ (y[:, None] & 0xFF)
            ^ (x[None, :] >> 8) ^ (y[:, None] >> 8)).astype(np.int32)


def _parts_ok() -> bool:
    """Rectangular partitions require the v3 native walk (syntax side)."""
    from ..entropy.native import get_lib

    lib = get_lib()
    return lib is not None and hasattr(lib, "tpuhevc_decision_walk_map_part")


def _lvl8(cfg) -> bool:
    offs = tuple(cfg.gop_qp_offsets) or (0,)
    return min(min(max(cfg.qp + o, 0), 51) for o in offs) >= 27


def _mode_tables(qp: int, num_ref: int, max_merge: int, amp: bool = True,
                 fb=None):
    """Host-side per-QP decision tables (P-slice init row). fb: optional
    FracBits override (FracBits.from_states feedback) — the adaptive
    re-freeze path builds the same structure from live context states."""
    from ..entropy.bitest import FracBits, ResidualBitEst

    fb = fb or FracBits(1, qp)
    b = fb.b
    # rectangular part_mode prefix bits (+ the AMP "not asymmetric" bin
    # when AMP is on — TEncSbac::codePartSize inter branch)
    amp_b = b("part_mode", 3, 1) if amp else 0.0
    t = dict(
        fb=fb,
        mvd_lut=fb.mvd_lut,                      # (4096,) f32 per |comp|
        skip0=b("cu_skip_flag", 1, 0), skip1=b("cu_skip_flag", 1, 1),
        pred_inter=b("pred_mode_flag", 0, 0),
        pred_intra=b("pred_mode_flag", 0, 1),
        prev_mode=[b("prev_intra_luma_pred_flag", 0, v) for v in (0, 1)],
        chroma_dm=b("intra_chroma_pred_mode", 0, 0),
        part2n=b("part_mode", 0, 1),
        part_hv=[b("part_mode", 0, 0) + b("part_mode", 1, 1) + amp_b,
                 b("part_mode", 0, 0) + b("part_mode", 1, 0) + amp_b],
        mf1=b("merge_flag", 0, 1), mf0=b("merge_flag", 0, 0),
        midx=[fb.merge_idx_bits(i, max_merge) for i in range(max_merge)],
        mvp=0.5 * (b("mvp_flag", 0, 0) + b("mvp_flag", 0, 1)),
        root1=b("rqt_root_cbf", 0, 1), root0=b("rqt_root_cbf", 0, 0),
        split=[b("split_cu_flag", 1, v) for v in (0, 1)],
        tsplit={lg: [b("split_transform_flag", 5 - lg, v) for v in (0, 1)]
                for lg in (3, 4, 5)},
        ref_bits=np.asarray([fb.ref_idx_bits(r, num_ref)
                             for r in range(max(num_ref, 1))], np.float32),
        cbf_y=[b("qt_cbf", 1, v) for v in (0, 1)],
        cbf_c=[b("qt_cbf", 5, v) for v in (0, 1)],
        est_y={lg: ResidualBitEst(fb, lg, True) for lg in (2, 3, 4, 5)},
        est_c={lg: ResidualBitEst(fb, lg, False) for lg in (2, 3, 4, 5)},
    )
    return t


# tabs entries whose values depend on context states (everything except
# fb and the est objects, which are handled structurally)
_LIVE_SCALARS = ("skip0", "skip1", "pred_inter", "pred_intra", "part2n",
                 "mf1", "mf0", "mvp", "root1", "root0", "chroma_dm")
_LIVE_VECTORS = ("prev_mode", "part_hv", "midx", "split", "cbf_y", "cbf_c")


def _tabs_live(t: dict) -> dict:
    """The adaptive subset of a _mode_tables dict as a flat pytree of
    float32 arrays — the runtime input a traced frame step consumes in
    place of the baked-in constants (the per-chunk context-feedback
    re-freeze; VERDICT r04 weak #5)."""
    lv = {k: np.float32(t[k]) for k in _LIVE_SCALARS}
    lv.update({k: np.asarray(t[k], np.float32) for k in _LIVE_VECTORS})
    lv["mvd_lut"] = np.asarray(t["mvd_lut"], np.float32)
    lv["ref_bits"] = np.asarray(t["ref_bits"], np.float32)
    lv["tsplit"] = {lg: np.asarray(v, np.float32)
                    for lg, v in t["tsplit"].items()}
    lv["est_y"] = {lg: e.cost_arrays() for lg, e in t["est_y"].items()}
    lv["est_c"] = {lg: e.cost_arrays() for lg, e in t["est_c"].items()}
    return lv


def grid_live_tables(cfg: "EncoderConfig", states_by_qp: dict) -> list:
    """Per-GOP-position live decision tables for the scan runner's
    `live` argument. states_by_qp: {qp: int32[NUM_CTX] end-of-slice
    context snapshot} from the written stream (native v5 ctx_out);
    positions whose QP has no feedback yet fall back to the warmed
    frozen tables (identical pytree structure)."""
    from ..entropy.bitest import FracBits

    sps = cfg.sps
    offs = tuple(cfg.gop_qp_offsets) or (0,)
    R = max(1, cfg.num_ref_frames)
    MM = cfg.max_num_merge_cand
    out = []
    cache: dict = {}
    for o in offs:
        qp = min(max(cfg.qp + o, 0), 51)
        key = qp
        if key not in cache:
            st = states_by_qp.get(qp)
            fb = (FracBits.from_states(1, qp, st) if st is not None
                  else None)
            cache[key] = _tabs_live(_mode_tables(qp, R, MM,
                                                 sps.amp_enabled, fb=fb))
        out.append(cache[key])
    return out


def _tabs_with_live(tabs: dict, lv: dict) -> dict:
    """Overlay live (possibly traced) arrays onto a frozen tabs dict."""
    t2 = dict(tabs)
    for k, v in lv.items():
        if k in ("est_y", "est_c"):
            t2[k] = {lg: tabs[k][lg].with_costs(v[lg]) for lg in v}
        else:
            t2[k] = v
    return t2


def build_ldp_grid_scan(cfg: EncoderConfig, nn_by_qp: dict, n_gops: int):
    import jax
    import jax.numpy as jnp

    try:  # persistent XLA cache: the scan graph is large, compile once
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from ..models import nnfme
    from ..ops import transforms as tx
    from ..ops.interp import CHROMA_TAPS, LUMA_TAPS

    sps = cfg.sps
    W, H = sps.coded_width, sps.coded_height
    bd = sps.bit_depth
    maxv = (1 << bd) - 1
    # hierarchical coarse search: the dense 2x-pooled stage covers +-16;
    # ranges up to the anchor's SearchRange 64
    # (encoder_lowdelay_P_main.cfg:31) are reached by a 4x-pooled
    # prestage whose per-block winner seeds an extra refine grid
    sr = 16 if cfg.search_range >= 16 else max(4, cfg.search_range // 4 * 4)
    sr_full = max(sr, min(cfg.search_range, 64) // 4 * 4)
    offs = tuple(cfg.gop_qp_offsets) or (0,)
    G = len(offs)
    qps = tuple(min(max(cfg.qp + o, 0), 51) for o in offs)
    lvl8 = _lvl8(cfg)
    fetch_recon = cfg.fetch_recon or cfg.hash_type != "checksum"
    R = max(1, cfg.num_ref_frames)
    MM = cfg.max_num_merge_cand
    use_rdoq = cfg.rdoq
    use_sbh = cfg.pps.sign_data_hiding
    use_deblock = cfg.deblocking
    use_sao = sps.sao_enabled
    use_wp = cfg.pps.weighted_pred
    key = ("v3", W, H, bd, sr, sr_full, cfg.fme_mode, qps, n_gops,
           fetch_recon,
           R, MM, cfg.nn_weights_dir, not nn_by_qp.get(qps[0]),
           use_rdoq, use_sbh, use_deblock, use_sao, use_wp,
           tuple(cfg.gop_qp_factors), cfg.qp, _parts_ok(),
           sps.max_tu_depth_inter, sps.temporal_mvp_enabled,
           tuple(sorted(_TUNE.items())))
    hit = _BUILD_CACHE.get(key)
    if hit is not None:
        return hit

    nh16, nw16 = H // 16, W // 16
    nh32, nw32 = H // 32, W // 32
    nh64, nw64 = H // 64, W // 64
    nh8, nw8 = H // 8, W // 8
    n16 = nh16 * nw16
    n32 = nh32 * nw32
    n64 = nh64 * nw64
    has32 = n32 > 0
    has64 = n64 > 0
    Hc, Wc = H // 2, W // 2  # chroma frame; UV packed side by side (Hc, W)
    h8, w8 = H // 8, W // 8

    tabs_by_qp = {qp: _mode_tables(qp, R, MM, sps.amp_enabled)
                  for qp in set(qps)}
    # rectangular inter PUs need the v3 native walk for the syntax side
    use_parts = bool(_TUNE["parts"]) and _TUNE["enable8"] and _parts_ok()
    # one-level inter RQT: needs an explicit split_transform_flag budget.
    # Captured HERE (build time, like the cache key) — frame_step traces
    # lazily on the first call, when _TUNE may already have changed.
    use_tusplit = (bool(_TUNE.get("tusplit", True))
                   and cfg.sps.max_tu_depth_inter >= 1)
    # device-side TMVP candidate generation (the host walk handles the
    # normative list; this only feeds the merge_rd arbitration)
    use_tmvp_dev = (bool(_TUNE.get("tmvp_dev", True))
                    and sps.temporal_mvp_enabled
                    and bool(_TUNE.get("merge_rd", True)))

    _COL_GEOM_CACHE: dict = {}

    def _col_geom(S, nbh, nbw):
        """Static TMVP gather geometry per CU class: C0 (bottom-right)
        validity mask + flat 16-grid indices, and the C1 (center)
        indices (temporal_candidate's two probe positions)."""
        hit = _COL_GEOM_CACHE.get(S)
        if hit is None:
            hc16, wc16 = (h8 + 1) // 2, (w8 + 1) // 2
            x0 = (np.arange(nbw) * S)[None, :].repeat(nbh, 0)
            y0 = (np.arange(nbh) * S)[:, None].repeat(nbw, 1)
            xbr, ybr = x0 + S, y0 + S
            lc = sps.log2_ctu
            ok0 = (((ybr >> lc) == (y0 >> lc)) & (ybr < H) & (xbr < W))
            i0 = (np.clip(ybr >> 4, 0, hc16 - 1) * wc16
                  + np.clip(xbr >> 4, 0, wc16 - 1)).ravel()
            xc, yc = x0 + S // 2, y0 + S // 2
            i1 = ((yc >> 4) * wc16 + (xc >> 4)).ravel()
            hit = (ok0, i0.astype(np.int32), i1.astype(np.int32))
            _COL_GEOM_CACHE[S] = hit
        return hit

    # ME constants ------------------------------------------------------
    R2 = sr // 2
    nc = 2 * R2 + 1
    coarse_bits = np.zeros((nc, nc), np.int32)
    for dy in range(nc):
        for dx in range(nc):
            coarse_bits[dy, dx] = (_mvd_bits_np(8 * (dx - R2))
                                   + _mvd_bits_np(8 * (dy - R2)))
    ref_off = np.arange(-3, 4)

    rdxs = np.tile(ref_off, 7)      # (49,) offset x per refine point
    rdys = np.repeat(ref_off, 7)    # (49,) offset y

    # interp margins (mv integer reach = sr_full + 4 after refine + frac)
    LOOK = sr_full + 4
    PADL = LOOK + 4
    LOOKC = sr_full // 2 + 2
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

    def tile_sum(p, t):
        hh, ww = p.shape
        return p.reshape(hh // t, t, ww // t, t).sum((1, 3))

    def up(p, t):
        return jnp.repeat(jnp.repeat(p, t, 0), t, 1)

    def plane_tiles(p, T, hp, wp):
        """(hp, wp) plane -> (nT, T, T) tiles, row-major tile order."""
        return (p.reshape(hp // T, T, wp // T, T)
                .transpose(0, 2, 1, 3).reshape(-1, T, T))

    _RDOQ_TILE_CACHE: dict = {}

    def _rdoq_tiles(est, hp, wp):
        """Plane-tiled cost maps for one ResidualBitEst (s0/s1 via
        jnp.tile so live traced tables flow through; the CG0 geometry
        mask is a cached host constant)."""
        S = est.S
        ty, tw = hp // S, wp // S
        sig = jnp.asarray(est.sig_bits)[0]  # prev_csbf = 0 pattern
        s0 = jnp.tile(sig[:, :, 0], (ty, tw)).astype(jnp.float32)
        s1 = jnp.tile(sig[:, :, 1], (ty, tw)).astype(jnp.float32)
        key = (S, hp, wp)
        cg0 = _RDOQ_TILE_CACHE.get(key)
        if cg0 is None:
            # CG0 (DC) flag per 4x4 CG of each TU
            cg0 = np.zeros((hp // 4, wp // 4), np.float32)
            cg0[:: S // 4, :: S // 4] = 1.0
            _RDOQ_TILE_CACHE[key] = cg0
        return s0, s1, cg0

    _LASTPOS_CACHE: dict = {}

    def _lastpos_geom(log2t, est):
        """Static scan geometry for the last-position walk-back:
        M (S^2, S^2) raster->scan permutation (scanned = flat @ M), and
        the (gx, gy) last-coordinate group indices per scan position."""
        hit = _LASTPOS_CACHE.get(log2t)
        if hit is None:
            n2 = 1 << (2 * log2t)
            scan = est.scan  # scan pos -> raster (geometry, shared)
            M = np.zeros((n2, n2), np.float32)
            M[scan, np.arange(n2)] = 1.0
            gi = np.asarray(est.group_idx, np.int64)
            lb = (gi[np.asarray(est.scan_x, np.int64)],
                  gi[np.asarray(est.scan_y, np.int64)])
            hit = (M, lb)
            _LASTPOS_CACHE[log2t] = hit
        return hit

    def rdoq_plane(coef, qp, log2t, lam_f, est):
        """Device rate-distortion-optimized quantization
        (TComTrQuant::xRateDistOptQuant, SURVEY §A.1): per-coefficient
        {ceil, ceil-1, 0} choice by orthonormal-domain distortion +
        lambda * estimated CABAC bits — real estBitsSbac-style table
        costs (position-dependent significance contexts, gt1/gt2, the
        Golomb-Rice remainder with per-CG Rice adaptation, sign) — then
        the per-CG all-zero trial against the coded-sub-block flag.
        The running c1/c2 context walk is approximated by the c1=1
        states; the last-position walk-back is the remaining delta."""
        qpe = qp + 6 * (bd - 8)
        per, rem = qpe // 6, qpe % 6
        tshift = tx.MAX_TR_DYNAMIC_RANGE - bd - log2t
        qbits = 14 + per + tshift
        scale = float(tx.QUANT_SCALES[rem])
        ac = jnp.abs(coef).astype(jnp.float32) * scale
        lmax = jnp.ceil(ac / (1 << qbits)).astype(jnp.float32)
        err_den = scale * (1 << tshift)
        hp, wp = coef.shape
        s0, s1, cg0m = _rdoq_tiles(est, hp, wp)
        is_cg0 = up(jnp.asarray(cg0m), 4)
        g1 = jnp.asarray(est.gt1_bits)
        g10 = jnp.asarray(est.gt1_bits0)
        g2 = jnp.asarray(est.gt2_bits)
        g20 = jnp.asarray(est.gt2_bits0)
        gt1_0 = jnp.where(is_cg0 > 0, g10[0], g1[0])
        gt1_1 = jnp.where(is_cg0 > 0, g10[1], g1[1])
        gt2_0 = jnp.where(is_cg0 > 0, g20[0], g2[0])
        gt2_1 = jnp.where(is_cg0 > 0, g20[1], g2[1])
        # per-CG Rice parameter from the ceiling levels (the decision-
        # time stand-in for the running adaptation)
        cg_max = up(jnp.max(lmax.reshape(hp // 4, 4, wp // 4, 4),
                            axis=(1, 3)), 4)
        rice = jnp.clip(jnp.where(
            cg_max > 6.0,
            jnp.log2(jnp.maximum(cg_max, 1.0) / 3.0), 0.0),
            0, 4).astype(jnp.int32)

        def lvl_bits(level):
            rem_ = jnp.maximum(level - 3.0, 0.0)
            three = (3 << rice).astype(jnp.float32)
            rl = jnp.where(
                rem_ * 1.0 < three,
                jnp.floor(rem_ / jnp.exp2(rice.astype(jnp.float32)))
                + 1.0 + rice,
                4.0 + rice + 2.0 * jnp.floor(jnp.log2(
                    jnp.maximum(rem_ - three, 0.0)
                    / jnp.exp2(rice.astype(jnp.float32)) + 1.0)))
            return (s1 + 1.0 + gt1_0
                    + jnp.where(level > 1.0,
                                gt1_1 - gt1_0 + gt2_0
                                + jnp.where(level > 2.0,
                                            gt2_1 - gt2_0 + rl, 0.0),
                                0.0))

        def cost(level):
            d = (ac - level * float(1 << qbits)) / err_den
            bits = jnp.where(level > 0, lvl_bits(level), s0)
            return d * d + lam_f * bits

        l1 = jnp.maximum(lmax, 0.0)
        l2 = jnp.maximum(lmax - 1.0, 0.0)
        best = jnp.where(cost(l1) <= cost(l2), l1, l2)
        best = jnp.where(cost(best) <= cost(jnp.zeros_like(best)), best,
                         0.0)
        # per-CG all-zero trial: coded cost (incl. sig-0 bits of the
        # kept zeros) + csbf(1) vs zero distortion + csbf(0)
        csbf = jnp.asarray(est.csbf_bits)  # (nb ctx, bin) — nb ctx 0
        dz = (ac - best * float(1 << qbits)) / err_den
        keep_bits = jnp.where(best > 0, lvl_bits(best), s0)
        ck = tile_sum(dz * dz + lam_f * keep_bits, 4)
        acn = ac / err_den
        cz = tile_sum(acn * acn, 4)
        keep = ck + lam_f * csbf[0, 1] <= cz + lam_f * csbf[0, 0]
        best = jnp.where(up(keep, 4), best, 0.0)
        if _TUNE.get("rdoq_lastpos", True):
            # last-position walk-back (the d64 block of
            # TComTrQuant::xRateDistOptQuant, TComTrQuant.cpp:2404-2457):
            # choosing scan position p as the TU's last significant
            # coefficient costs the coded prefix (< p, sig flags
            # included), the level at p WITHOUT its sig flag (implied),
            # the last_sig_x/y prefix+suffix bits of p's coordinates,
            # and pure zero distortion for everything after p. The
            # reverse-scan scalar walk becomes two cumsums + an argmin
            # over scan space — the batched-DP shape of the same
            # optimum.
            S = 1 << log2t
            n2 = S * S
            M, lb = _lastpos_geom(log2t, est)
            dzl = (ac - best * float(1 << qbits)) / err_den
            czp = acn * acn
            # prefix cost per pixel: kept CGs code sig flags + levels
            # (+ csbf 1 spread over the CG); zeroed CGs cost zero
            # distortion + csbf 0 spread — not per-pixel sig-0 bits
            cc = jnp.where(
                up(keep, 4),
                dzl * dzl
                + lam_f * (jnp.where(best > 0, lvl_bits(best), s0)
                           + csbf[0, 1] / 16.0),
                czp + lam_f * csbf[0, 0] / 16.0)
            s1p = s1
            flat = lambda p: plane_tiles(p, S, hp, wp).reshape(-1, n2)  # noqa: E731
            Mj = jnp.asarray(M)
            ccs = flat(cc) @ Mj
            czs = flat(czp) @ Mj
            bs = flat(best) @ Mj
            s1s = flat(s1p) @ Mj
            pref = jnp.cumsum(ccs, axis=1) - ccs
            tot_cz = jnp.sum(czs, axis=1, keepdims=True)
            suf = tot_cz - jnp.cumsum(czs, axis=1)
            lbv = lam_f * jnp.asarray(est.lastx_bits)[lb[0]][None] \
                + lam_f * jnp.asarray(est.lasty_bits)[lb[1]][None]
            costp = pref + ccs - lam_f * s1s + lbv + suf
            costp = jnp.where(bs > 0, costp, jnp.inf)
            pbest = jnp.argmin(costp, axis=1)
            ms = jnp.arange(n2)[None, :] <= pbest[:, None]
            bs = jnp.where(ms, bs, 0.0)
            nT = bs.shape[0]
            tiles = (bs @ Mj.T).reshape(nT, S, S)
            ty_, tw_ = hp // S, wp // S
            best = tiles.reshape(ty_, tw_, S, S).transpose(0, 2, 1, 3) \
                .reshape(hp, wp)
        lim = 127 if lvl8 else 32767
        return jnp.clip(jnp.sign(coef) * best.astype(jnp.int32), -lim, lim)

    def ideal_plane(coef, qp, log2t):
        """Signed real-valued quantizer pre-rounding value (tx.
        ideal_levels_np twin) — SBH's minimal-damage reference."""
        qpe = qp + 6 * (bd - 8)
        per, rem = qpe // 6, qpe % 6
        tshift = tx.MAX_TR_DYNAMIC_RANGE - bd - log2t
        qbits = 14 + per + tshift
        return (coef.astype(jnp.float32) * float(tx.QUANT_SCALES[rem])
                / (1 << qbits))

    from ..utils.tables import SCAN_DIAG, scan_order

    _s4 = scan_order(2, SCAN_DIAG)  # scanpos -> raster in 4x4
    _sbh_P = np.zeros((16, 16), np.int32)
    for _p in range(16):
        _sbh_P[_p, int(_s4[_p])] = 1

    def _to_cg_scan(plane, hp, wp):
        """(hp, wp) plane -> (16, nCG) rows in 4x4 diag-scan order, via
        reshape + a 16x16 permutation einsum (no gathers; nCG rides the
        lane dimension per the measured device preference)."""
        x = plane.reshape(hp // 4, 4, wp // 4, 4).transpose(1, 3, 0, 2)
        x = x.reshape(16, -1)
        P = jnp.asarray(_sbh_P).astype(x.dtype)
        return jnp.einsum("pr,rc->pc", P, x)

    def _from_cg_scan(rows, hp, wp):
        P = jnp.asarray(_sbh_P).astype(rows.dtype)
        x = jnp.einsum("pr,pc->rc", P, rows)
        return (x.reshape(4, 4, hp // 4, wp // 4)
                .transpose(2, 0, 3, 1).reshape(hp, wp))

    def sbh_plane(lvl, ideal):
        """Device sign-bit-hiding post-pass (signBitHidingHDQ,
        TComTrQuant.cpp:991 / entropy/residual.apply_sign_bit_hiding):
        per 4x4 CG with scan span >= 4, adjust one level by +-1 so the
        abs-sum parity encodes the first coefficient's sign, choosing the
        adjustment with the smallest requantization error (deltaU).
        All work in (16, nCG) layout — CGs on lanes, scan on sublanes."""
        hp, wp = lvl.shape
        lv = _to_cg_scan(lvl, hp, wp)              # (16, nCG)
        iv = _to_cg_scan(ideal, hp, wp)
        a = jnp.abs(lv)
        nz = a > 0
        pos = jnp.arange(16)[:, None]
        first = jnp.min(jnp.where(nz, pos, 16), axis=0)   # (nCG,)
        last = jnp.max(jnp.where(nz, pos, -1), axis=0)
        hide = (last - first) >= 4
        first_sel = pos == jnp.minimum(first, 15)[None]
        want = jnp.sum(jnp.where(first_sel, lv, 0), axis=0) < 0
        need = hide & ((jnp.sum(a, axis=0) & 1) != want.astype(jnp.int32))
        ia = jnp.abs(iv)
        in_rng = (pos >= first[None]) & (pos <= last[None])
        lim = 127 if lvl8 else 32767
        inf = jnp.float32(1e30)
        err_up = jnp.where(in_rng & (a + 1 <= lim),
                           jnp.abs(a + 1 - ia), inf)
        bad_dn = (a == 0) | ((pos == first[None]) & (a == 1))
        err_dn = jnp.where(in_rng & ~bad_dn, jnp.abs(a - 1 - ia), inf)
        errs = jnp.concatenate([err_up, err_dn], axis=0)  # (32, nCG)
        bi = jnp.argmin(errs, axis=0)
        p_sel = bi % 16
        d_abs = jnp.where(bi < 16, 1, -1)
        sel = pos == p_sel[None]
        sgn = jnp.sum(jnp.where(sel, lv, 0), axis=0)
        isgn = jnp.sum(jnp.where(sel, iv, 0), axis=0)
        sgn = jnp.where(sgn != 0, jnp.sign(sgn),
                        jnp.where(isgn >= 0, 1, -1)).astype(lv.dtype)
        delta = jnp.where(need[None] & sel,
                          (sgn * d_abs)[None], 0).astype(lv.dtype)
        return _from_cg_scan(lv + delta, hp, wp)

    # --- ME --------------------------------------------------------------
    # DC-aware matching: a candidate whose residual is (smooth offset +
    # aligned texture) must beat one that scrambles texture to minimize
    # plain SAD — the offset costs one cheap DC coefficient while grain
    # costs uncodable bits. zcost = SAD - |sum| + min(|sum|, DCC): the
    # zero-mean SAD plus the (capped) price of coding the DC. DCC =
    # lambda*bits(DC) + quantizer-step floor, per block size.
    zme = _TUNE["zme"]

    def _dcc(qp, npx, lam_me):
        qstep = 2.0 ** ((qp + 6 * (bd - 8) - 4) / 6.0)
        return jnp.int32(int((lam_me * 12) >> 8) + int(npx * qstep / 4.0))

    def _zc(sad, sdc, dcc):
        a = jnp.abs(sdc)
        return sad - a + jnp.minimum(a, dcc)

    def coarse_stack(oy2, ry2p):
        sads, sums = [], []
        for dy in range(nc):
            for dx in range(nc):
                d = (ry2p[dy : dy + H // 2, dx : dx + W // 2]
                     - oy2).astype(jnp.int32)
                sads.append(tile_sum(jnp.abs(d), 8) << 1)
                if zme:
                    sums.append(tile_sum(d, 8))
        return (jnp.stack(sads),
                jnp.stack(sums) if zme else None)

    def pick_coarse(s16, sum16, qp, lam_me, nbh, nbw, f):
        """Coarse winner per block; f = aggregation factor in 16-units."""
        s = s16
        sm = sum16
        if f > 1:
            s = s[:, : nbh * f, : nbw * f].reshape(-1, nbh, f, nbw, f).sum(
                (2, 4))
            if zme:
                sm = sm[:, : nbh * f, : nbw * f].reshape(
                    -1, nbh, f, nbw, f).sum((2, 4))
        if zme:
            s = _zc(s, sm, _dcc(qp, (16 * f) ** 2, lam_me))
        cost = s + ((jnp.asarray(coarse_bits.reshape(-1))[:, None, None]
                     * lam_me) >> 8)
        ci = jnp.argmin(cost.reshape(nc * nc, -1), axis=0)
        cy = ci // nc - R2
        cx = ci % nc - R2
        return cx.astype(jnp.int32), cy.astype(jnp.int32)

    def _refine_grid(ry, cur, bx, by, ccx, ccy, S, qp, lam_me,
                     quads=False, ry_y0=0, anchor=None):
        """7x7 SAD grid at full-pel centers (ccx, ccy) per block, as 49
        STATIC slices of one gathered window (nb, S+6, S+6) — no inner
        gather, XLA lowers the shifts to strided reads. Returns
        (sad (nb,49[,4]), zcost masked to the inner 5x5, mvx, mvy);
        quads additionally keeps the four 8x8 quadrant partial sums so
        the 8-block class can be derived from the 16 windows for free.
        sad stays RAW (the NN-FME surface input, reference semantics);
        only the selection cost is DC-aware."""
        win = S + 6
        hr, wr = ry.shape  # stripe-aware: ry may carry halo rows
        yy = jnp.clip(by[:, None] + ccy[:, None] - 3 + ry_y0
                      + jnp.arange(win)[None], 0, hr - 1)
        xx = jnp.clip(bx[:, None] + ccx[:, None] - 3
                      + jnp.arange(win)[None], 0, wr - 1)
        wnd = jnp.take(ry.reshape(-1),
                       yy[:, :, None] * wr + xx[:, None, :]).astype(jnp.int16)
        nb = wnd.shape[0]
        nq = (S // 8) ** 2 if quads else 1
        sads, sums = [], []
        for k in range(49):
            dy, dx = k // 7, k % 7
            d = (jax.lax.dynamic_slice(
                wnd, (0, dy, dx), (nb, S, S)) - cur).astype(jnp.int32)
            if quads:
                f = S // 8
                q = jnp.abs(d).reshape(nb, f, 8, f, 8).sum((2, 4))
                sads.append(q.reshape(nb, nq))
                if zme:
                    sums.append(d.reshape(nb, f, 8, f, 8).sum(
                        (2, 4)).reshape(nb, nq))
            else:
                sads.append(jnp.abs(d).sum((-1, -2))[:, None])
                if zme:
                    sums.append(d.sum((-1, -2))[:, None])
        sadq = jnp.stack(sads, axis=1)           # (nb, 49, nq)
        sumq = jnp.stack(sums, axis=1) if zme else None
        sad = sadq.sum(-1)
        sel = sad
        if zme:
            sel = _zc(sad, sumq.sum(-1), _dcc(qp, S * S, lam_me))
        mvx = ccx[:, None] + jnp.asarray(rdxs)[None]
        mvy = ccy[:, None] + jnp.asarray(rdys)[None]
        # MV rate anchored at the per-block predictor proxy (temporal
        # seed when available) rather than |mv| itself — HM's search
        # pays bits vs the AMVP predictor (getCostOfVectorWithPredictor),
        # which keeps the field coherent where motion is shared
        if anchor is not None:
            rx = mvx - anchor[0][:, None]
            ry_ = mvy - anchor[1][:, None]
        else:
            rx, ry_ = mvx, mvy
        babs = (2 * jnp.ceil(jnp.log2(2.0 * jnp.abs(rx * 4) + 1))
                .astype(jnp.int32)
                + 2 * jnp.ceil(jnp.log2(2.0 * jnp.abs(ry_ * 4) + 1))
                .astype(jnp.int32) + 2)
        inner = jnp.asarray((np.abs(rdxs) <= 2) & (np.abs(rdys) <= 2))
        cost = sel + ((babs * lam_me) >> 8)
        cost = jnp.where(inner[None], cost, jnp.int32(1 << 30))
        if not quads:
            return sad, cost, mvx, mvy, None
        selq = sadq
        if zme:
            selq = _zc(sadq, sumq, _dcc(qp, 64, lam_me))
        costq = selq + ((babs * lam_me) >> 8)[:, :, None]
        costq = jnp.where(inner[None, :, None], costq,
                          jnp.int32(1 << 30))
        return sad, cost, mvx, mvy, (sadq, costq)

    def _pick_grids(grids, with_q=False, qi=None):
        """argmin across concatenated candidate grids + 3x3 surface."""
        gi = 4 if with_q else 0
        if with_q:
            sad = jnp.concatenate([g[4][0][:, :, qi] for g in grids], 1)
            cost = jnp.concatenate([g[4][1][:, :, qi] for g in grids], 1)
        else:
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
        mv = jnp.clip(mv, -(sr_full + 3), sr_full + 3)
        return mv, sad9, best_cost

    def refine(ry, oy, cx4, cy4, S, nbh, nbw, qp, lam_me, with_zero=True,
               global_c=None, extra_c=None, extra_c2=None,
               want_quads=False, ry_y0=0, anchor_c=None):
        """Full-pel refinement: 7x7 grids around the coarse winner AND
        (optionally) the zero MV and the frame-global coarse winner (the
        TZ predictor set's start candidates: median/zero + the dominant
        motion); argmin restricted to each grid's inner 5x5 so the 3x3
        SAD surface exists. Returns (mv_int, sad9, best_cost) and, with
        want_quads (S=16 only), the same triple for the four 8x8
        quadrants (identical candidate sets to an independent 8-class
        refine at the parent's centers, at a quarter of the gathers)."""
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
        q = want_quads
        anchor = None
        if anchor_c is not None and _TUNE.get("anchor_left", True):
            # MV rate anchored at the LEFT NEIGHBOR's coarse winner —
            # the batched proxy of HM's AMVP predictor inside the search
            # (getCostOfVectorWithPredictor): candidates coherent with
            # the neighbor cost near-zero mvd bits, which is where the
            # stream's 11x mvd-bits gap vs the anchor lived
            anchor = (anchor_c[0].reshape(-1), anchor_c[1].reshape(-1))
        elif extra_c is not None and _TUNE.get("anchor_seed", True):
            anchor = (extra_c[0].reshape(-1), extra_c[1].reshape(-1))
        grids = [_refine_grid(ry, cur, bx, by, ccx, ccy, S, qp, lam_me,
                              quads=q, ry_y0=ry_y0, anchor=anchor)]
        if with_zero:
            zero = jnp.zeros_like(ccx)
            grids.append(_refine_grid(ry, cur, bx, by, zero, zero, S, qp,
                                      lam_me, quads=q, ry_y0=ry_y0,
                                      anchor=anchor))
        if global_c is not None:
            ggx = jnp.broadcast_to(global_c[0] * 2, ccx.shape)
            ggy = jnp.broadcast_to(global_c[1] * 2, ccy.shape)
            grids.append(_refine_grid(ry, cur, bx, by, ggx, ggy, S, qp,
                                      lam_me, quads=q, ry_y0=ry_y0,
                                      anchor=anchor))
        if extra_c is not None:
            # temporal seed: the co-located previous-frame MV (a TMVP-
            # style start candidate; TZ's predictor set analog)
            grids.append(_refine_grid(ry, cur, bx, by,
                                      extra_c[0].reshape(-1),
                                      extra_c[1].reshape(-1), S, qp,
                                      lam_me, quads=q, ry_y0=ry_y0,
                                      anchor=anchor))
        if extra_c2 is not None:
            # long-range prestage winner (SearchRange up to 64)
            grids.append(_refine_grid(ry, cur, bx, by,
                                      extra_c2[0].reshape(-1),
                                      extra_c2[1].reshape(-1), S, qp,
                                      lam_me, quads=q, ry_y0=ry_y0,
                                      anchor=anchor))
        main = _pick_grids(grids)
        if not want_quads:
            return main
        # quadrant picks -> 8-grid order (2*by8 + qy, 2*bx8 + qx)
        qmv, qs9, qc = [], [], []
        for qi in range(4):
            m, s9, c = _pick_grids(grids, with_q=True, qi=qi)
            qmv.append(m)
            qs9.append(s9)
            qc.append(c)

        def to8(xs, tail):
            x = jnp.stack(xs, 1).reshape((nbh, nbw, 2, 2) + tail)
            return x.transpose((0, 2, 1, 3)
                               + tuple(4 + i for i in range(len(tail)))
                               ).reshape((nbh * 2 * nbw * 2,) + tail)

        quad = (to8(qmv, (2,)), to8(qs9, (9,)), to8(qc, ()))
        return main + (quad,)

    # --- MC phase planes --------------------------------------------------
    tl_j = jnp.asarray(taps_l)  # (4, 8)
    tc_j = jnp.asarray(taps_c)  # (8, 4)

    def luma_planes_all(ry_stack, wpy=None):
        """(R, H, W) -> (R, 4, 4, HmL, WmL) int16 phase planes. With
        wpy = (w (R,), o (R,), denom ()) the explicit-WP weighting is
        folded into the final rounding of the 14-bit intermediate
        (weightUnidir, TComWeightPrediction.cpp:52) — identity weights
        reduce to the default (p14 + 32) >> 6 bit-exactly."""
        rp = jnp.pad(ry_stack, ((0, 0), (PADL, PADL), (PADL, PADL)),
                     mode="edge")
        hsh = jnp.stack([rp[:, :, i + 1 : i + 1 + WmL] for i in range(8)],
                        axis=1)
        hst = jnp.einsum("fi,rihw->rfhw", tl_j, hsh)
        vsh = jnp.stack([hst[:, :, j + 1 : j + 1 + HmL, :] for j in range(8)],
                        axis=1)
        pl = jnp.einsum("gj,rjfhw->rgfhw", tl_j, vsh)
        p14 = pl >> 6
        if wpy is None:
            return jnp.clip((p14 + 32) >> 6, 0, maxv).astype(jnp.int16)
        w_, o_, d_ = wpy
        sh = d_ + 6
        rnd = (jnp.int32(1) << sh) >> 1
        return jnp.clip(((p14 * w_[:, None, None, None, None] + rnd) >> sh)
                        + o_[:, None, None, None, None],
                        0, maxv).astype(jnp.int16)

    def chroma_planes_all(ruv_stack, wpc=None):
        """(R, Hc, W) packed [U|V] -> (pl_u, pl_v) each
        (R, 8, 8, HmC, WmC) int16. wpc = (w (R,2), o (R,2), denom ())
        folds chroma WP into the final rounding (see luma_planes_all)."""
        halves = jnp.stack([ruv_stack[:, :, :Wc], ruv_stack[:, :, Wc:]],
                           axis=1)
        rp = jnp.pad(halves, ((0, 0), (0, 0), (PADC, PADC), (PADC, PADC)),
                     mode="edge")
        hsh = jnp.stack([rp[..., i + 1 : i + 1 + WmC] for i in range(4)],
                        axis=2)
        hst = jnp.einsum("fi,ruihw->rufhw", tc_j, hsh)
        vsh = jnp.stack([hst[:, :, :, j + 1 : j + 1 + HmC, :]
                         for j in range(4)], axis=2)
        pl = jnp.einsum("gj,rujfhw->rugfhw", tc_j, vsh)
        p14 = pl >> 6
        if wpc is None:
            pl = jnp.clip((p14 + 32) >> 6, 0, maxv).astype(jnp.int16)
            return pl[:, 0], pl[:, 1]
        w_, o_, d_ = wpc
        sh = d_ + 6
        rnd = (jnp.int32(1) << sh) >> 1
        pl = jnp.clip(
            ((p14 * w_[:, :, None, None, None, None] + rnd) >> sh)
            + o_[:, :, None, None, None, None], 0, maxv).astype(jnp.int16)
        return pl[:, 0], pl[:, 1]

    def pred_luma(planes, mvq_pix, ref_pix, hp, wp):
        ygrid = jnp.arange(hp)[:, None]
        xgrid = jnp.arange(wp)[None, :]
        fx = mvq_pix[..., 0] & 3
        fy = mvq_pix[..., 1] & 3
        ix = (mvq_pix[..., 0] >> 2) + xgrid + LOOK
        iy = (mvq_pix[..., 1] >> 2) + ygrid + LOOK
        idx = (((ref_pix * 16 + fy * 4 + fx) * HmL) + iy) * WmL + ix
        return jnp.take(planes.reshape(-1), idx).astype(jnp.int32)

    def pred_chroma(pl, mvq_pix, ref_pix, hp, wp):
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

    _HAD8 = np.array([[1, 1, 1, 1, 1, 1, 1, 1],
                      [1, -1, 1, -1, 1, -1, 1, -1],
                      [1, 1, -1, -1, 1, 1, -1, -1],
                      [1, -1, -1, 1, 1, -1, -1, 1],
                      [1, 1, 1, 1, -1, -1, -1, -1],
                      [1, -1, 1, -1, -1, 1, -1, 1],
                      [1, 1, -1, -1, -1, -1, 1, 1],
                      [1, -1, -1, 1, -1, 1, 1, -1]], np.int32)

    def satd8_plane(res):
        """Whole-plane 8x8 Hadamard SATD map (xCalcHADs8x8 counterpart,
        TComRdCost.cpp:1330): per 8-block sum|H R H^T| >> 2, as two plane
        einsums — the coding-cost-aware distortion HadamardME uses."""
        Hm = jnp.asarray(_HAD8)
        hp, wp = res.shape
        v = jnp.einsum("kj,bjx->bkx", Hm,
                       res.reshape(hp // 8, 8, wp)).reshape(hp, wp)
        h = jnp.einsum("kj,bjx->bkx", Hm,
                       v.T.reshape(wp // 8, 8, hp)).reshape(wp, hp).T
        return (tile_sum(jnp.abs(h), 8) + 2) >> 2  # (hp/8, wp/8)

    def pred_sse(planes_y, oy_c, mv_grid, ref_grid, S, Hp, Wp):
        mvp_ = jnp.stack([up(mv_grid[..., 0], S), up(mv_grid[..., 1], S)],
                         -1)
        p = pred_luma(planes_y, mvp_, up(ref_grid, S), Hp, Wp)
        return tile_sum((oy_c - p) ** 2, S).astype(jnp.float32)

    def pred_satd(planes_y, oy_c, mv_grid, ref_grid, S, Hp, Wp):
        """Per-CU Hadamard SATD of the prediction error — approximates
        the transform-domain coding cost, discriminating codable (smooth)
        from uncodable (grain) residuals, which plain SSE cannot."""
        mvp_ = jnp.stack([up(mv_grid[..., 0], S), up(mv_grid[..., 1], S)],
                         -1)
        p = pred_luma(planes_y, mvp_, up(ref_grid, S), Hp, Wp)
        m8 = satd8_plane(oy_c - p)
        if S == 8:
            return m8.astype(jnp.float32)
        f = S // 8
        return m8.reshape(Hp // S, f, Wp // S, f).sum((1, 3)).astype(
            jnp.float32)

    def pred_satd_z(planes_y, oy_c, mv_grid, ref_grid, S, Hp, Wp, qp,
                    lam_me_f):
        """DC-aware per-CU SATD: AC Hadamard energy + the (capped) price
        of the DC terms. A merge candidate whose residual is the aligned
        texture plus a smooth offset scores its true coding cost instead
        of being punished for the offset (xCheckRDCostMerge2Nx2N codes
        the residual and gets this discrimination for free)."""
        if not zme:
            return pred_satd(planes_y, oy_c, mv_grid, ref_grid, S, Hp, Wp)
        mvp_ = jnp.stack([up(mv_grid[..., 0], S), up(mv_grid[..., 1], S)],
                         -1)
        p = pred_luma(planes_y, mvp_, up(ref_grid, S), Hp, Wp)
        r = oy_c - p
        m8 = satd8_plane(r)
        dc8 = (jnp.abs(tile_sum(r, 8)) + 2) >> 2
        ac8 = (m8 - dc8).astype(jnp.float32)
        qstep = 2.0 ** ((qp + 6 * (bd - 8) - 4) / 6.0)
        dcc = lam_me_f * 12.0 + (S * S) * qstep / 4.0
        if S == 8:
            return ac8 + jnp.minimum(dc8.astype(jnp.float32), dcc)
        f = S // 8
        ac = ac8.reshape(Hp // S, f, Wp // S, f).sum((1, 3))
        dcsum = dc8.reshape(Hp // S, f, Wp // S, f).sum(
            (1, 3)).astype(jnp.float32)
        cu_dc = ((jnp.abs(tile_sum(r, S)) + 2) >> 2).astype(jnp.float32)
        dcvar = jnp.maximum(dcsum - cu_dc, 0.0)
        return (ac + 0.5 * dcvar
                + jnp.minimum(cu_dc, dcc))

    def subpel_refine(planes_y, oy, mv_int, ref_grid, S, nbh, nbw):
        """DCT-IF fractional refinement (xPatternSearchFracDIF /
        xPatternRefinement counterpart, TEncSearch.cpp:5232): 9-point
        half-pel square then 9-point quarter-pel square around the best,
        scored by prediction SSE on the interpolated phase planes. Two
        fused rounds of masked dense evaluation instead of HM's
        sequential SATD loop."""
        Hp, Wp = nbh * S, nbw * S
        oy_c = oy[:Hp, :Wp]
        mvq = mv_int.reshape(nbh, nbw, 2) * 4
        refg = ref_grid.reshape(nbh, nbw)
        offs9 = [(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        for step in (2, 1):
            costs = []
            for dx, dy in offs9:
                d = jnp.asarray([dx * step, dy * step], jnp.int32)
                costs.append(pred_satd(planes_y, oy_c, mvq + d, refg, S,
                                       Hp, Wp))
            c = jnp.stack(costs)                      # (9, nbh, nbw)
            bi = jnp.argmin(c, axis=0)
            dxs = jnp.asarray([o[0] for o in offs9])[bi] * step
            dys = jnp.asarray([o[1] for o in offs9])[bi] * step
            mvq = mvq + jnp.stack([dxs, dys], -1)
        return mvq.reshape(-1, 2)

    # --- device deblocking (P slices: luma bs<=1, no chroma) ------------
    from ..ops.deblock import BETA_TABLE, TC_TABLE

    def _tb_cbf_cells(log2_map, cbf_cells):
        """Per-8-cell luma-TB cbf (TB = min(CU, 32)): broadcast any-nz
        over each cell's TB region, selected by the cell's TU log2."""
        def grp_any(c, f):
            if f == 1:
                return c
            hh, ww = c.shape
            hq = -(-hh // f) * f
            wq = -(-ww // f) * f
            cp = jnp.pad(c, ((0, hq - hh), (0, wq - ww)))
            g = cp.reshape(hq // f, f, wq // f, f).any((1, 3))
            return jnp.repeat(jnp.repeat(g, f, 0), f, 1)[:hh, :ww]

        tu_log2 = jnp.minimum(log2_map.astype(jnp.int32), 5)
        any8 = cbf_cells
        any16 = grp_any(cbf_cells, 2)
        any32 = grp_any(cbf_cells, 4)
        return jnp.where(tu_log2 == 3, any8,
                         jnp.where(tu_log2 == 4, any16, any32))

    def _bs_dir(log2_map, mv_map, ref_map, tb_cbf, axis, intra=None):
        """(h8, w8) boundary strength for the edge at each cell's
        left (axis 1) / top (axis 0); P-slice rules (§8.7.2.4 with the
        deblock.boundary_strength semantics); intra cells force bs 2.
        The cbf condition applies at TU edges only; the motion condition
        applies at EVERY 8-aligned edge — motion is constant inside a
        PU, so any 8-edge with a motion difference IS a PU (or CU)
        boundary. This makes the derivation generic over every PU shape
        (square, 2NxN/Nx2N at any CU size, AMP) with no partition map,
        mirroring ops/deblock.boundary_strength_full."""
        tu_log2 = jnp.minimum(log2_map.astype(jnp.int32), 5)
        cs = (jnp.arange(w8)[None] if axis == 1
              else jnp.arange(h8)[:, None])
        edge = (cs % (1 << (tu_log2 - 3))) == 0
        if axis == 1:
            p_cbf = jnp.roll(tb_cbf, 1, 1)
            p_mv = jnp.roll(mv_map, 1, 1)
            p_ref = jnp.roll(ref_map, 1, 1)
            border = jnp.asarray((np.arange(w8) == 0)[None].repeat(h8, 0))
        else:
            p_cbf = jnp.roll(tb_cbf, 1, 0)
            p_mv = jnp.roll(mv_map, 1, 0)
            p_ref = jnp.roll(ref_map, 1, 0)
            border = jnp.asarray(
                (np.arange(h8) == 0)[:, None].repeat(w8, 1))
        mv_far = (jnp.abs(mv_map - p_mv) >= 4).any(-1) | (
            ref_map != p_ref)
        bs = ((((tb_cbf | p_cbf) & edge) | mv_far)
              & ~border).astype(jnp.int32)
        if intra is not None:
            # TU edges are a superset of CU edges, so `edge` is exactly
            # the spec's (CU edge | TU edge) condition for intra bs 2
            p_in = jnp.roll(intra, 1, 1 if axis == 1 else 0)
            bs = jnp.where((intra | p_in) & edge & ~border, 2, bs)
        return bs

    def _deblock_luma_vert(plane, bs8, qp):
        """Vertical-edge pass over the whole plane; bs8 per 8-cell.
        Shape-generic (the horizontal pass calls it on the transpose)."""
        hp, wp = plane.shape
        wt = wp // 8
        t = plane.reshape(hp, wt, 8)
        # p_k = left tile col 7-k, q_k = right tile col k, edges at tiles
        p = jnp.stack([jnp.roll(t, 1, 1)[:, :, 7 - k] for k in range(4)],
                      -1)  # (hp, wt, 4) p0..p3
        q = t[:, :, :4]
        # segments of 4 rows: (h4, 4, wt, ...)
        h4 = hp // 4
        ps = p.reshape(h4, 4, wt, 4).astype(jnp.int32)
        qs = q.reshape(h4, 4, wt, 4).astype(jnp.int32)
        bs_seg = jnp.repeat(bs8, 2, axis=0)  # (h4, wt)
        beta = jnp.int32(int(BETA_TABLE[min(max(qp, 0), 51)]))
        tc1 = int(TC_TABLE[min(max(qp, 0), 53)])
        tc2 = int(TC_TABLE[min(max(qp + 2, 0), 53)])
        tc = jnp.where(bs_seg == 2, jnp.int32(tc2), jnp.int32(tc1))
        dp0 = jnp.abs(ps[:, 0, :, 2] - 2 * ps[:, 0, :, 1] + ps[:, 0, :, 0])
        dp3 = jnp.abs(ps[:, 3, :, 2] - 2 * ps[:, 3, :, 1] + ps[:, 3, :, 0])
        dq0 = jnp.abs(qs[:, 0, :, 2] - 2 * qs[:, 0, :, 1] + qs[:, 0, :, 0])
        dq3 = jnp.abs(qs[:, 3, :, 2] - 2 * qs[:, 3, :, 1] + qs[:, 3, :, 0])
        dpq0 = dp0 + dq0
        dpq3 = dp3 + dq3
        d = dpq0 + dpq3
        do_f = (d < beta) & (bs_seg > 0)

        def dsam(line, dpq):
            sp = jnp.abs(ps[:, line, :, 3] - ps[:, line, :, 0])
            sq = jnp.abs(qs[:, line, :, 0] - qs[:, line, :, 3])
            spq = jnp.abs(ps[:, line, :, 0] - qs[:, line, :, 0])
            return ((2 * dpq < (beta >> 2))
                    & (sp + sq < (beta >> 3))
                    & (spq < ((5 * tc + 1) >> 1)))

        strong = dsam(0, dpq0) & dsam(3, dpq3) & do_f
        weak = do_f & ~strong
        tcb = tc[:, None, :]  # broadcast over the 4 lines
        pp, qq = ps, qs  # (h4, 4, w8, 4)
        sp0 = (pp[..., 2] + 2 * pp[..., 1] + 2 * pp[..., 0]
               + 2 * qq[..., 0] + qq[..., 1] + 4) >> 3
        sp1 = (pp[..., 2] + pp[..., 1] + pp[..., 0] + qq[..., 0] + 2) >> 2
        sp2 = (2 * pp[..., 3] + 3 * pp[..., 2] + pp[..., 1] + pp[..., 0]
               + qq[..., 0] + 4) >> 3
        sq0 = (qq[..., 2] + 2 * qq[..., 1] + 2 * qq[..., 0]
               + 2 * pp[..., 0] + pp[..., 1] + 4) >> 3
        sq1 = (qq[..., 2] + qq[..., 1] + qq[..., 0] + pp[..., 0] + 2) >> 2
        sq2 = (2 * qq[..., 3] + 3 * qq[..., 2] + qq[..., 1] + qq[..., 0]
               + pp[..., 0] + 4) >> 3

        def clip2(v, ref):
            return jnp.clip(v, ref - 2 * tcb, ref + 2 * tcb)

        sp0 = clip2(sp0, pp[..., 0])
        sp1 = clip2(sp1, pp[..., 1])
        sp2 = clip2(sp2, pp[..., 2])
        sq0 = clip2(sq0, qq[..., 0])
        sq1 = clip2(sq1, qq[..., 1])
        sq2 = clip2(sq2, qq[..., 2])

        delta = (9 * (qq[..., 0] - pp[..., 0])
                 - 3 * (qq[..., 1] - pp[..., 1]) + 8) >> 4
        w_on = weak[:, None] & (jnp.abs(delta) < 10 * tcb)
        dlt = jnp.clip(delta, -tcb, tcb)
        wp0 = jnp.clip(pp[..., 0] + dlt, 0, maxv)
        wq0 = jnp.clip(qq[..., 0] - dlt, 0, maxv)
        side = (beta + (beta >> 1)) >> 3
        dep = ((dp0 + dp3) < side)[:, None]
        deq2 = ((dq0 + dq3) < side)[:, None]
        tch = tcb >> 1
        dp_ = jnp.clip((((pp[..., 2] + pp[..., 0] + 1) >> 1)
                        - pp[..., 1] + dlt) >> 1, -tch, tch)
        dq_ = jnp.clip((((qq[..., 2] + qq[..., 0] + 1) >> 1)
                        - qq[..., 1] - dlt) >> 1, -tch, tch)
        wp1 = jnp.clip(pp[..., 1] + dp_, 0, maxv)
        wq1 = jnp.clip(qq[..., 1] + dq_, 0, maxv)

        s_on = strong[:, None]
        np0 = jnp.where(s_on, sp0, jnp.where(w_on, wp0, pp[..., 0]))
        np1 = jnp.where(s_on, sp1, jnp.where(w_on & dep, wp1, pp[..., 1]))
        np2 = jnp.where(s_on, sp2, pp[..., 2])
        nq0 = jnp.where(s_on, sq0, jnp.where(w_on, wq0, qq[..., 0]))
        nq1 = jnp.where(s_on, sq1, jnp.where(w_on & deq2, wq1,
                                             qq[..., 1]))
        nq2 = jnp.where(s_on, sq2, qq[..., 2])
        # write back: q side into cols 0..2 of each tile, p side into
        # cols 7..5 of the LEFT tile (roll back)
        newq = jnp.stack([nq0, nq1, nq2], -1).reshape(hp, wt, 3)
        t2 = jnp.concatenate([newq, t[:, :, 3:]], axis=2)
        newp = jnp.stack([np2, np1, np0], -1).reshape(hp, wt, 3)
        newp = jnp.roll(newp, -1, axis=1)  # back to the owning tile
        t3 = jnp.concatenate([t2[:, :, :5], newp], axis=2)
        return t3.reshape(hp, wp)

    def _deblock_chroma_vert(plane, bs2_half, qpc_):
        """Vertical chroma edges (bs == 2 only, §8.7.2.5.5): 2-tap
        filter at every 8-chroma-sample column edge. plane: one chroma
        half (Hc, Wc); bs2_half: (Hc//4, Wc//8) bool (per 4-row chroma
        segment x per 8-col edge; edge k at x = 8k, k >= 1)."""
        hc, wc = plane.shape
        wt = wc // 8
        tcc = jnp.int32(int(TC_TABLE[min(max(qpc_ + 2, 0), 53)]))
        t = plane.reshape(hc, wt, 8)
        p1 = jnp.roll(t, 1, 1)[:, :, 6]
        p0 = jnp.roll(t, 1, 1)[:, :, 7]
        q0 = t[:, :, 0]
        q1 = t[:, :, 1]
        on = jnp.repeat(bs2_half, 4, axis=0)  # (hc, wt)
        on = on & jnp.asarray((np.arange(wt) > 0)[None])
        delta = jnp.clip((((q0 - p0) * 4) + p1 - q1 + 4) >> 3, -tcc, tcc)
        np0 = jnp.clip(p0 + delta, 0, maxv)
        nq0 = jnp.clip(q0 - delta, 0, maxv)
        np0 = jnp.where(on, np0, p0)
        nq0 = jnp.where(on, nq0, q0)
        t = t.at[:, :, 0].set(nq0)
        pback = jnp.roll(np0[:, :, None], -1, axis=1)
        t = t.at[:, :, 7:].set(jnp.where(
            jnp.roll(on, -1, 1)[:, :, None], pback, t[:, :, 7:]))
        return t.reshape(hc, wc)

    def deblock_device(rec_y, rec_uv, log2_map, mv_map, ref_map,
                       cbf_cells, qp, intra_cells=None,
                       tsplit_cells=None):
        """Whole-frame deblock (vertical then horizontal edges), device
        twin of ops/deblock.deblock_frame for P slices. Luma filters
        bs >= 1 edges; chroma only bs == 2 (intra) edges. Same int math;
        parity is tested against the host filter. PU-internal edges of
        rectangular/AMP CUs need no partition map: _bs_dir applies the
        motion condition at every 8-aligned edge (§8.7.2.2 PU
        boundaries fall out of the per-cell MV differences).
        tsplit_cells: per-8-cell one-level RQT split — TB edges and cbf
        regions use the leaf TU size (all leaves >= 8, so the per-8-cell
        grid stays exact)."""
        tu_map = jnp.minimum(log2_map.astype(jnp.int32), 5)
        if tsplit_cells is not None:
            tu_map = tu_map - tsplit_cells.astype(jnp.int32)
        tb_cbf = _tb_cbf_cells(tu_map, cbf_cells)
        bs_v = _bs_dir(tu_map, mv_map, ref_map, tb_cbf, 1, intra_cells)
        y = _deblock_luma_vert(rec_y, bs_v, qp)
        bs_h = _bs_dir(tu_map, mv_map, ref_map, tb_cbf, 0, intra_cells)
        y = _deblock_luma_vert(y.T, bs_h.T, qp).T
        if intra_cells is None:
            return y, rec_uv
        qpc_ = chroma_qp(qp)
        # chroma edges live on the 16-luma grid: cell edge (y8, x8) with
        # x8 even; per-4-chroma-row segment = per 8-luma-row = per cell
        bs2v = (bs_v == 2)[:, ::2]                    # (h8, w8/2)
        bs2h = (bs_h == 2)[::2, :]                    # (h8/2, w8)
        u = rec_uv[:, :Wc]
        v = rec_uv[:, Wc:]
        halves = []
        for pl in (u, v):
            c = _deblock_chroma_vert(pl, bs2v, qpc_)
            c = _deblock_chroma_vert(c.T, bs2h.T, qpc_).T
            halves.append(c)
        return y, jnp.concatenate(halves, axis=1)

    # --- device SAO (stats -> per-CTU RDO -> apply) ----------------------
    CTU = 1 << sps.log2_ctu
    SAO_INF = jnp.float32(1e18)

    def _eo_cat(rec, klass):
        """Whole-plane EO category map + validity (ops/sao.eo_category
        twin)."""
        from ..ops.sao import EO_NEIGHBORS

        hh, ww = rec.shape
        (dy0, dx0), (dy1, dx1) = EO_NEIGHBORS[klass]

        def nbr(dy, dx):
            return jnp.pad(rec, ((max(-dy, 0), max(dy, 0)),
                                 (max(-dx, 0), max(dx, 0))),
                           mode="edge")[max(dy, 0) : max(dy, 0) + hh,
                                        max(dx, 0) : max(dx, 0) + ww]

        et = jnp.sign(rec - nbr(dy0, dx0)) + jnp.sign(rec - nbr(dy1, dx1))
        cat = jnp.asarray([1, 2, 0, 3, 4], jnp.int32)[et + 2]
        valid = np.ones((hh, ww), bool)
        for dy, dx in ((dy0, dx0), (dy1, dx1)):
            if dx < 0:
                valid[:, 0] = False
            if dx > 0:
                valid[:, -1] = False
            if dy < 0:
                valid[0, :] = False
            if dy > 0:
                valid[-1, :] = False
        return cat, jnp.asarray(valid)

    def _ctu_sum(m, ctu, hh, ww, ny, nx):
        """Masked per-CTU sum with zero-padding to full tiles."""
        mp = jnp.pad(m, ((0, ny * ctu - hh), (0, nx * ctu - ww)))
        return tile_sum(mp, ctu)

    def _cls_hist(cls, diff, ncls, ctu, hh, ww, ny, nx):
        """One-hot class histogram + diff sums per CTU in two einsum
        reductions instead of ncls masked tile-sum passes."""
        oh = (cls[..., None] == jnp.arange(ncls)[None, None]).astype(
            jnp.float32)
        ohp = jnp.pad(oh, ((0, ny * ctu - hh), (0, nx * ctu - ww),
                           (0, 0)))
        dp = jnp.pad(diff, ((0, ny * ctu - hh), (0, nx * ctu - ww)))
        oh4 = ohp.reshape(ny, ctu, nx, ctu, ncls)
        cnt = oh4.sum((1, 3))
        sm = jnp.einsum("abcde,abcd->ace", oh4,
                        dp.reshape(ny, ctu, nx, ctu))
        return cnt, sm

    def _sao_stats(org, rec, ctu):
        hh, ww = rec.shape
        ny = (hh + ctu - 1) // ctu
        nx = (ww + ctu - 1) // ctu
        diff = (org - rec).astype(jnp.float32)
        eo_cnt, eo_sum = [], []
        for klass in range(4):
            cat, valid = _eo_cat(rec, klass)
            cls = jnp.where(valid, cat, 0)  # cat 0 never coded
            cnt, sm = _cls_hist(cls, diff, 5, ctu, hh, ww, ny, nx)
            eo_cnt.append(cnt[..., 1:])
            eo_sum.append(sm[..., 1:])
        eo_cnt = jnp.stack(eo_cnt, -2)  # (ny, nx, 4, 4)
        eo_sum = jnp.stack(eo_sum, -2)
        band = rec >> (bd - 5)
        bc, bs_ = _cls_hist(band, diff, 32, ctu, hh, ww, ny, nx)
        return (eo_cnt, eo_sum, bc, bs_)

    def _best_eo(cnt, s, lam_f, sign):
        """(ny, nx) count/sum for one class+cat -> (offset, cost)."""
        start = jnp.clip(jnp.round(sign * s / jnp.maximum(cnt, 1.0)),
                         0, 7).astype(jnp.int32)
        o = jnp.arange(8, dtype=jnp.float32)
        sh = (1,) * cnt.ndim + (8,)
        ob = o.reshape(sh)
        d = cnt[..., None] * ob * ob - 2.0 * ob * (sign * s)[..., None]
        cost = d + lam_f * (ob + 1.0)
        cost = jnp.where(jnp.arange(8).reshape(sh)
                         <= start[..., None], cost, SAO_INF)
        bi = jnp.argmin(cost, -1)
        return bi.astype(jnp.int32), jnp.take_along_axis(
            cost, bi[..., None], -1)[..., 0]

    def _eval_eo_all(eo_cnt, eo_sum, lam_f):
        """-> (offs (ny,nx,4,4), cost (ny,nx,4)) per EO class."""
        offs, costs = [], []
        for cat in range(4):
            sign = 1.0 if cat < 2 else -1.0
            o, c = _best_eo(eo_cnt[..., cat], eo_sum[..., cat], lam_f,
                            sign)
            offs.append(o)
            costs.append(c)
        return (jnp.stack(offs, -1),
                sum(costs) + lam_f * 2.0)  # + eo_class bits

    def _eval_bo(bo_cnt, bo_sum, lam_f):
        """-> (off4 (ny,nx,4), pos (ny,nx), cost (ny,nx))."""
        start = jnp.clip(jnp.round(bo_sum / jnp.maximum(bo_cnt, 1.0)),
                         -7, 7)
        mags = jnp.arange(8, dtype=jnp.float32)  # 0..7 magnitude
        sh = (1, 1, 1, 8)
        m = mags.reshape(sh)
        sgn = jnp.where(start >= 0, 1.0, -1.0)[..., None]
        o = sgn * m
        d = bo_cnt[..., None] * o * o - 2.0 * o * bo_sum[..., None]
        cost = d + lam_f * (m + 2.0)
        cost = jnp.where(m <= jnp.abs(start)[..., None], cost, SAO_INF)
        cost = cost.at[..., 0].set(lam_f)  # o = 0: one TR bin
        bi = jnp.argmin(cost, -1)
        bo = (sgn[..., 0] * bi.astype(jnp.float32)).astype(jnp.int32)
        bc = jnp.take_along_axis(cost, bi[..., None], -1)[..., 0]
        # sliding 4-band window over positions 0..28
        wins = jnp.stack([bc[..., p : p + 4].sum(-1) for p in range(29)],
                         -1)
        pos = jnp.argmin(wins, -1).astype(jnp.int32)
        off4 = jnp.stack([jnp.take_along_axis(bo, pos[..., None] + i,
                                              -1)[..., 0]
                          for i in range(4)], -1)
        cost = jnp.take_along_axis(wins, pos[..., None], -1)[..., 0] \
            + lam_f * 5.0  # band_position bits
        return off4, pos, cost

    def _sao_decide_plane(st, lam_f, type_bits):
        """One component: best (type, aux, off4, cost)."""
        eo_cnt, eo_sum, bo_cnt, bo_sum = st
        eo_offs, eo_cost = _eval_eo_all(eo_cnt, eo_sum, lam_f)
        bo_off, bo_pos, bo_cost = _eval_bo(bo_cnt, bo_sum, lam_f)
        # candidates: OFF, EO0..3, BO
        costs = jnp.stack([jnp.full(bo_cost.shape, lam_f)]
                          + [eo_cost[..., k] + type_bits for k in range(4)]
                          + [bo_cost + type_bits], -1)
        bi = jnp.argmin(costs, -1)
        typ = jnp.where(bi == 0, -1, jnp.where(bi <= 4, bi - 1, 4))
        aux = jnp.where(bi == 5, bo_pos, 0)
        off = jnp.zeros(eo_offs[..., 0, :].shape, jnp.int32)
        for k in range(4):
            off = jnp.where((bi == k + 1)[..., None], eo_offs[..., k, :],
                            off)
        off = jnp.where((bi == 5)[..., None], bo_off, off)
        cost = jnp.take_along_axis(costs, bi[..., None], -1)[..., 0]
        return (typ.astype(jnp.int32), aux.astype(jnp.int32), off,
                cost, eo_offs, eo_cost, bo_off, bo_pos, bo_cost)

    def _sao_apply_plane(rec, types, aux, off4, ctu):
        """apply_sao_plane twin: per-pixel class/band gather + offset."""
        hh, ww = rec.shape
        ny, nx = types.shape
        cy = np.minimum(np.arange(hh) // ctu, ny - 1)
        cx = np.minimum(np.arange(ww) // ctu, nx - 1)
        ci = jnp.asarray(cy[:, None] * nx + cx[None, :])  # (hh, ww)
        t_pix = types.reshape(-1)[ci]
        out = rec
        for klass in range(4):
            cat, valid = _eo_cat(rec, klass)
            o = off4.reshape(-1, 4)
            lut = jnp.stack([jnp.zeros_like(o[:, 0]), o[:, 0], o[:, 1],
                             -o[:, 2], -o[:, 3]], -1)  # (nCTU, 5)
            add = lut[ci, cat]
            add = jnp.where(valid & (t_pix == klass), add, 0)
            out = out + add
        # BO: per-CTU 32-entry LUT via one-hot composition
        band = rec >> (bd - 5)
        o = off4.reshape(-1, 4)
        pos = aux.reshape(-1)
        lut32 = jnp.zeros((ny * nx, 32), jnp.int32)
        for i in range(4):
            lut32 = lut32 + (jnp.arange(32)[None]
                             == ((pos[:, None] + i) % 32)) * o[:, i : i + 1]
        addb = lut32[ci, band]
        out = out + jnp.where(t_pix == 4, addb, 0)
        return jnp.clip(out, 0, maxv)

    def sao_device(oy, ouv, rec_y, rec_uv, lam_f, sao_qp):
        """Stats + RDO + apply for all components (chroma shares the
        type). Returns filtered planes + packed per-CTU params. No merge
        flags yet (each CTU codes new params; the host syntax supports
        merges but the device decides without them)."""
        st_y = _sao_stats(oy, rec_y, CTU)
        st_cb = _sao_stats(ouv[:, :Wc], rec_uv[:, :Wc], CTU // 2)
        st_cr = _sao_stats(ouv[:, Wc:], rec_uv[:, Wc:], CTU // 2)
        ty, ay, offy, cost_y, _, _, _, _, _ = _sao_decide_plane(
            st_y, lam_f, 2.0 * lam_f)
        lam_y = lam_f
        lam_f = lam_f / jnp.float32(
            2.0 ** ((sao_qp - chroma_qp(sao_qp)) / 3.0))  # chroma weight
        # chroma: shared type minimizing joint cost
        _, _, _, _, eo_off_cb, eo_cost_cb, bo_off_cb, bo_pos_cb, \
            bo_cost_cb = _sao_decide_plane(st_cb, lam_f, 0.0)
        _, _, _, _, eo_off_cr, eo_cost_cr, bo_off_cr, bo_pos_cr, \
            bo_cost_cr = _sao_decide_plane(st_cr, lam_f, 0.0)
        joint = jnp.stack(
            [jnp.full(bo_cost_cb.shape, lam_f)]
            + [eo_cost_cb[..., k] + eo_cost_cr[..., k] - 2.0 * lam_f
               + 2.0 * lam_f for k in range(4)]
            + [bo_cost_cb + bo_cost_cr + 2.0 * lam_f], -1)
        bi = jnp.argmin(joint, -1)
        tc = jnp.where(bi == 0, -1, jnp.where(bi <= 4, bi - 1, 4))
        acb = jnp.where(bi == 5, bo_pos_cb, 0)
        acr = jnp.where(bi == 5, bo_pos_cr, 0)
        ocb = jnp.zeros_like(eo_off_cb[..., 0, :])
        ocr = jnp.zeros_like(eo_off_cr[..., 0, :])
        for k in range(4):
            ocb = jnp.where((bi == k + 1)[..., None],
                            eo_off_cb[..., k, :], ocb)
            ocr = jnp.where((bi == k + 1)[..., None],
                            eo_off_cr[..., k, :], ocr)
        ocb = jnp.where((bi == 5)[..., None], bo_off_cb, ocb)
        ocr = jnp.where((bi == 5)[..., None], bo_off_cr, ocr)
        # picture-level component on/off by aggregate RD
        # (TEncSampleAdaptiveOffset::decidePicParams' slice-disable
        # counterpart, done by direct measurement instead of the
        # saoEncodingRate heuristic): with a component on, every CTU
        # pays its chosen cost (>= one type-off bin) plus the shared
        # merge-flag floor; slice-off costs nothing. The floor is paid
        # once while EITHER component is on — charge it to each
        # component alone and to the pair jointly, pick the argmin of
        # the four on/off configurations.
        ny_c, nx_c = cost_y.shape
        n_flags = jnp.float32(ny_c * (nx_c - 1) + (ny_c - 1) * nx_c)
        cost_c = jnp.take_along_axis(joint, bi[..., None], -1)[..., 0]
        sum_y = jnp.sum(cost_y)
        sum_c = jnp.sum(cost_c)
        floor = lam_y * n_flags  # ~1 bit per coded merge flag
        c_off = jnp.float32(0.0)
        c_lu = sum_y + floor
        c_ch = sum_c + floor
        c_both = sum_y + sum_c + floor
        cfgs = jnp.stack([c_off, c_lu, c_ch, c_both])
        ci = jnp.argmin(cfgs)
        luma_on = (ci == 1) | (ci == 3)
        chroma_on = (ci == 2) | (ci == 3)
        ty = jnp.where(luma_on, ty, -1)
        tc = jnp.where(chroma_on, tc, -1)
        new_y = _sao_apply_plane(rec_y, ty, ay, offy, CTU)
        new_cb = _sao_apply_plane(rec_uv[:, :Wc], tc, acb, ocb, CTU // 2)
        new_cr = _sao_apply_plane(rec_uv[:, Wc:], tc, acr, ocr, CTU // 2)
        params = jnp.concatenate([
            x.astype(jnp.int8).reshape(-1)
            for x in (ty, ay, offy, tc, acb, ocb, acr, ocr)])
        return new_y, jnp.concatenate([new_cb, new_cr], 1), params

    def cand_sweep(tabs, qp, lam_me_f, oy, planes_y, mv_grid, ref_grid, S,
                   nbh, nbw):
        """Merge-candidate RD sweeps (left, top, left, top). Adopts the
        neighbor's (mv, ref) when prediction SATD + merge bits beat the
        AMVP path's mvd/ref/mvp bits — SATD (not SSE) so a smooth,
        codable residual wins over grain-chasing MVs, the discrimination
        HM gets from coding the merge candidates' residuals
        (xCheckRDCostMerge2Nx2N). Returns the settled grids plus
        per-block estimated mode bits (non-skip syntax) and merge flag."""
        Hp, Wp = nbh * S, nbw * S
        oy_c = oy[:Hp, :Wp]
        mvd_lut = jnp.asarray(tabs["mvd_lut"])
        ref_lut = jnp.asarray(tabs["ref_bits"])
        sat0 = pred_satd_z(planes_y, oy_c, mv_grid, ref_grid, S, Hp, Wp,
                           qp, lam_me_f)
        merged = jnp.zeros((nbh, nbw), bool)
        midx_b = jnp.zeros((nbh, nbw), jnp.float32)
        # jump-flood schedule: HM's raster wavefront propagates a good MV
        # across the whole frame within one picture (each CU merges from
        # already-decided neighbors); log-distance passes give the same
        # reach in O(log n) batched steps. Rolled into one lax.scan body
        # (dynamic shift distances) so the graph holds TWO sweep bodies,
        # not 2*log2(n) — compile time and step latency both depend on it.
        if _TUNE["sweep"]:
            # sparse jump schedule: reach ~21 blocks/frame; the temporal
            # seed carries converged MVs across frames, so full single-
            # frame reach is not worth 2x the sweep passes
            dists = [d for d in (1, 4, 16) if d < max(nbh, nbw)] + [1]
            mb0 = jnp.asarray(tabs["midx"][0], jnp.float32)
            mb1 = jnp.asarray(tabs["midx"][1], jnp.float32)

            def sweep_pair(carry, dist):
                mv_g, ref_g, s0, mrg, mib = carry
                for axis, mb in ((1, mb0), (0, mb1)):
                    mvc = jnp.roll(mv_g, dist, axis=axis)
                    refc = jnp.roll(ref_g, dist, axis=axis)
                    if axis == 1:
                        edge = jnp.arange(nbw)[None] < dist
                        edge = jnp.broadcast_to(edge, (nbh, nbw))
                    else:
                        edge = jnp.arange(nbh)[:, None] < dist
                        edge = jnp.broadcast_to(edge, (nbh, nbw))
                    satc = pred_satd_z(planes_y, oy_c, mvc, refc, S, Hp,
                                       Wp, qp, lam_me_f)
                    dmv = jnp.minimum(jnp.abs(mv_g - mvc), 4095)
                    keep_b = (mvd_lut[dmv[..., 0]] + mvd_lut[dmv[..., 1]]
                              + ref_lut[ref_g] + tabs["mf0"]
                              + tabs["mvp"])
                    keep_b = jnp.where(mrg, tabs["mf1"] + mib, keep_b)
                    lam_b = lam_me_f * _TUNE["merge_bias"]
                    adopt = (satc + lam_b * (tabs["mf1"] + mb)
                             <= s0 + lam_b * keep_b) & ~edge
                    mv_g = jnp.where(adopt[..., None], mvc, mv_g)
                    ref_g = jnp.where(adopt, refc, ref_g)
                    s0 = jnp.where(adopt, satc, s0)
                    mrg = mrg | adopt
                    mib = jnp.where(adopt, mb, mib)
                return (mv_g, ref_g, s0, mrg, mib), None

            (mv_grid, ref_grid, sat0, merged, midx_b), _ = jax.lax.scan(
                sweep_pair, (mv_grid, ref_grid, sat0, merged, midx_b),
                jnp.asarray(dists, jnp.int32))
        # final mode bits (non-skip CU): pred_mode + part + merge/amvp
        left_mv = jnp.concatenate([mv_grid[:, :1], mv_grid[:, :-1]], 1)
        top_mv = jnp.concatenate([mv_grid[:1], mv_grid[:-1]], 0)
        d1 = jnp.minimum(jnp.abs(mv_grid - left_mv), 4095)
        d2 = jnp.minimum(jnp.abs(mv_grid - top_mv), 4095)
        mvd_b = jnp.minimum(mvd_lut[d1[..., 0]] + mvd_lut[d1[..., 1]],
                            mvd_lut[d2[..., 0]] + mvd_lut[d2[..., 1]])
        amvp_b = (tabs["mf0"] + ref_lut[ref_grid] + tabs["mvp"] + mvd_b)
        mode_b = (tabs["pred_inter"] + tabs["part2n"]
                  + jnp.where(merged, tabs["mf1"] + midx_b, amvp_b))
        return mv_grid, ref_grid, mode_b, merged, midx_b

    def cand_sweep_all(tabs, qp, lam_me_f, oy, planes_y, specs):
        """cand_sweep fused across the size classes: the expensive
        whole-cover ops (MC gather + 8x8 Hadamard SATD) run ONCE on a
        (C, Hp, Wp) batch instead of per class — same math, ~1/C the op
        count of the sweep's hot path (the tunnel perf model's "hundreds
        of small HLOs cost more than the math"). specs: list of
        (S, nbh, nbw, mv_qpel, ref); specs[0]'s pixel cover must contain
        every class's cover (the 16 class at CTU-aligned sizes does).
        Returns cand_sweep's 5-tuple per spec."""
        C = len(specs)
        S0, nbh0, nbw0 = specs[0][0], specs[0][1], specs[0][2]
        Hp, Wp = nbh0 * S0, nbw0 * S0
        oy_c = oy[:Hp, :Wp]
        mvd_lut = jnp.asarray(tabs["mvd_lut"])
        ref_lut = jnp.asarray(tabs["ref_bits"])
        qstep = 2.0 ** ((qp + 6 * (bd - 8) - 4) / 6.0)

        def to_pix(S, nbh_, nbw_, mv_g, ref_g):
            h, w = nbh_ * S, nbw_ * S
            mvp = jnp.stack([up(mv_g[..., 0], S), up(mv_g[..., 1], S)],
                            -1)
            refp = up(ref_g, S)
            if h < Hp or w < Wp:
                mvp = jnp.pad(mvp, ((0, Hp - h), (0, Wp - w), (0, 0)))
                refp = jnp.pad(refp, ((0, Hp - h), (0, Wp - w)))
            return mvp, refp

        def batch_satd(grids):
            """grids: per class (mv_g, ref_g) block grids -> per-class
            DC-aware SATD maps (pred_satd_z twin, batched)."""
            mvps = []
            refps = []
            for (S, nbh_, nbw_, _, _), (mv_g, ref_g) in zip(specs, grids):
                mvp, refp = to_pix(S, nbh_, nbw_, mv_g, ref_g)
                mvps.append(mvp)
                refps.append(refp)
            mvq_pix = jnp.stack(mvps)          # (C, Hp, Wp, 2)
            ref_pix = jnp.stack(refps)         # (C, Hp, Wp)
            ygrid = jnp.arange(Hp)[None, :, None]
            xgrid = jnp.arange(Wp)[None, None, :]
            fx = mvq_pix[..., 0] & 3
            fy = mvq_pix[..., 1] & 3
            ix = (mvq_pix[..., 0] >> 2) + xgrid + LOOK
            iy = (mvq_pix[..., 1] >> 2) + ygrid + LOOK
            idx = (((ref_pix * 16 + fy * 4 + fx) * HmL) + iy) * WmL + ix
            p = jnp.take(planes_y.reshape(-1), idx).astype(jnp.int32)
            r = oy_c[None] - p                  # (C, Hp, Wp)
            m8 = satd8_plane(r.reshape(C * Hp, Wp)).reshape(
                C, Hp // 8, Wp // 8)
            outs = []
            for ci, (S, nbh_, nbw_, _, _) in enumerate(specs):
                h, w = nbh_ * S, nbw_ * S
                rc = r[ci, :h, :w]
                m8c = m8[ci, : h // 8, : w // 8]
                if not zme:
                    if S == 8:
                        outs.append(m8c.astype(jnp.float32))
                    else:
                        f = S // 8
                        outs.append(m8c.reshape(nbh_, f, nbw_, f).sum(
                            (1, 3)).astype(jnp.float32))
                    continue
                dc8 = (jnp.abs(tile_sum(rc, 8)) + 2) >> 2
                ac8 = (m8c - dc8).astype(jnp.float32)
                dcc = lam_me_f * 12.0 + (S * S) * qstep / 4.0
                if S == 8:
                    outs.append(ac8 + jnp.minimum(
                        dc8.astype(jnp.float32), dcc))
                    continue
                f = S // 8
                ac = ac8.reshape(nbh_, f, nbw_, f).sum((1, 3))
                dcsum = dc8.reshape(nbh_, f, nbw_, f).sum(
                    (1, 3)).astype(jnp.float32)
                cu_dc = ((jnp.abs(tile_sum(rc, S)) + 2) >> 2).astype(
                    jnp.float32)
                dcvar = jnp.maximum(dcsum - cu_dc, 0.0)
                outs.append(ac + 0.5 * dcvar + jnp.minimum(cu_dc, dcc))
            return outs

        states = []
        sat0s = batch_satd([(mv, ref) for (_, _, _, mv, ref) in specs])
        for (S, nbh_, nbw_, mv, ref), s0 in zip(specs, sat0s):
            states.append((mv, ref, s0, jnp.zeros((nbh_, nbw_), bool),
                           jnp.zeros((nbh_, nbw_), jnp.float32)))

        if _TUNE["sweep"]:
            dmax = max(max(s[1], s[2]) for s in specs)
            dists = [d for d in (1, 4, 16) if d < dmax] + [1]
            mb0 = jnp.asarray(tabs["midx"][0], jnp.float32)
            mb1 = jnp.asarray(tabs["midx"][1], jnp.float32)

            def sweep_pair(carry, dist):
                sts = list(carry)
                for axis, mb in ((1, mb0), (0, mb1)):
                    cands = []
                    for (S, nbh_, nbw_, _, _), st in zip(specs, sts):
                        mv_g, ref_g = st[0], st[1]
                        cands.append((jnp.roll(mv_g, dist, axis=axis),
                                      jnp.roll(ref_g, dist, axis=axis)))
                    satcs = batch_satd(cands)
                    new = []
                    for (S, nbh_, nbw_, _, _), st, (mvc, refc), satc in \
                            zip(specs, sts, cands, satcs):
                        mv_g, ref_g, s0, mrg, mib = st
                        if axis == 1:
                            edge = jnp.arange(nbw_)[None] < dist
                            edge = jnp.broadcast_to(edge, (nbh_, nbw_))
                        else:
                            edge = jnp.arange(nbh_)[:, None] < dist
                            edge = jnp.broadcast_to(edge, (nbh_, nbw_))
                        dmv = jnp.minimum(jnp.abs(mv_g - mvc), 4095)
                        keep_b = (mvd_lut[dmv[..., 0]]
                                  + mvd_lut[dmv[..., 1]]
                                  + ref_lut[ref_g] + tabs["mf0"]
                                  + tabs["mvp"])
                        keep_b = jnp.where(mrg, tabs["mf1"] + mib, keep_b)
                        lam_b = lam_me_f * _TUNE["merge_bias"]
                        adopt = (satc + lam_b * (tabs["mf1"] + mb)
                                 <= s0 + lam_b * keep_b) & ~edge
                        new.append((
                            jnp.where(adopt[..., None], mvc, mv_g),
                            jnp.where(adopt, refc, ref_g),
                            jnp.where(adopt, satc, s0),
                            mrg | adopt,
                            jnp.where(adopt, mb, mib)))
                    sts = new
                return tuple(sts), None

            carry, _ = jax.lax.scan(sweep_pair, tuple(states),
                                    jnp.asarray(dists, jnp.int32))
            states = list(carry)

        outs = []
        for (S, nbh_, nbw_, _, _), (mv_g, ref_g, sat0, merged, midx_b) \
                in zip(specs, states):
            left_mv = jnp.concatenate([mv_g[:, :1], mv_g[:, :-1]], 1)
            top_mv = jnp.concatenate([mv_g[:1], mv_g[:-1]], 0)
            d1 = jnp.minimum(jnp.abs(mv_g - left_mv), 4095)
            d2 = jnp.minimum(jnp.abs(mv_g - top_mv), 4095)
            mvd_b = jnp.minimum(
                mvd_lut[d1[..., 0]] + mvd_lut[d1[..., 1]],
                mvd_lut[d2[..., 0]] + mvd_lut[d2[..., 1]])
            amvp_b = (tabs["mf0"] + ref_lut[ref_g] + tabs["mvp"] + mvd_b)
            mode_b = (tabs["pred_inter"] + tabs["part2n"]
                      + jnp.where(merged, tabs["mf1"] + midx_b, amvp_b))
            outs.append((mv_g, ref_g, mode_b, merged, midx_b))
        return outs

    def _txq_luma(oy_c, pred_y, T, qp, lam, tabs, Hp, Wp):
        """One luma transform/quant/recon pipeline at tile size T.
        Returns (lvl, rec, d_tu, b_tu, cbf_tu) at the T grid, with the
        per-TU cbf-zero drop applied."""
        log2t = T.bit_length() - 1
        coef = fwd_tx(oy_c - pred_y, T)
        if use_rdoq:
            lvl = rdoq_plane(coef, qp, log2t, lam, tabs["est_y"][log2t])
        else:
            lvl = quant_plane(coef, qp, log2t)
        if use_sbh:
            lvl = sbh_plane(lvl, ideal_plane(coef, qp, log2t))
        rsd = inv_tx(deq_plane(lvl, qp, log2t), T)
        rec = jnp.clip(pred_y + rsd, 0, maxv)
        nzb = tile_sum((lvl != 0).astype(jnp.int32), T)   # per TU
        rec = jnp.where(up(nzb > 0, T), rec, pred_y)
        d_skip = tile_sum((oy_c - pred_y) ** 2, T).astype(jnp.float32)
        d_coded = tile_sum((oy_c - rec) ** 2, T).astype(jnp.float32)
        est = tabs["est_y"][log2t]
        bits_tu = est.tu_bits(jnp, plane_tiles(lvl, T, Hp, Wp),
                              sbh=use_sbh).reshape(nzb.shape)
        cbf_b = tabs["cbf_y"]
        drop = (d_skip + lam * cbf_b[0]
                <= d_coded + lam * (bits_tu + cbf_b[1]))
        if not _TUNE["drop"]:
            drop = drop & (nzb == 0)
        dropp = up(drop, T)
        lvl = jnp.where(dropp, 0, lvl)
        rec = jnp.where(dropp, pred_y, rec)
        d_tu = jnp.where(drop, d_skip, d_coded)
        b_tu = jnp.where(drop, cbf_b[0], bits_tu + cbf_b[1])
        cbf_tu = jnp.where(drop, 0, nzb)
        return lvl, rec, d_tu, b_tu, cbf_tu, d_skip

    def class_code(qp, tabs, lam, oy, ouv, planes_y, pl_u, pl_v,
                   mv_grid, ref_grid, S, nbh, nbw, mv_cells=None,
                   ref_cells=None, tusplit=False):
        """Code every S-block under mv_grid/ref_grid with TU = min(S, 32).
        Returns composed planes + per-block (d, res_bits, cbf).
        mv_cells/ref_cells (per-8-cell maps over the class region)
        override the per-CU grids for rectangular-PU candidates.
        tusplit: additionally evaluate one level of RQT split (TU = T/2,
        §7.3.8.8; TEncSearch::xEstimateInterResidualQT semantics) and
        keep the RD winner per T-tile; leaf TUs stay >= 8 so the
        per-8-cell deblock boundary-strength grid remains exact."""
        qpc = chroma_qp(qp)
        T = min(S, 32)
        log2t = T.bit_length() - 1
        Hp, Wp = nbh * S, nbw * S
        fT = S // T  # TUs per CU side (luma)
        oy_c = oy[:Hp, :Wp]
        if mv_cells is not None:
            mvq_pix = jnp.stack([up(mv_cells[..., 0], 8),
                                 up(mv_cells[..., 1], 8)], -1)
            refp = up(ref_cells, 8)
        else:
            mvq_pix = jnp.stack([up(mv_grid[..., 0], S),
                                 up(mv_grid[..., 1], S)], -1)
            refp = up(ref_grid, S)
        pred_y = pred_luma(planes_y, mvq_pix, refp, Hp, Wp)
        lvl, rec, d_tu, b_tu, cbf_tu, d0_tu = _txq_luma(
            oy_c, pred_y, T, qp, lam, tabs, Hp, Wp)

        do_split = tusplit and T >= 16  # leaves stay >= 8
        if do_split:
            T2 = T // 2
            lvl2, rec2, d_tu2, b_tu2, cbf_tu2, _ = _txq_luma(
                oy_c, pred_y, T2, qp, lam, tabs, Hp, Wp)

            def t_sum(x):  # T2 grid -> T grid
                return x.reshape(x.shape[0] // 2, 2,
                                 x.shape[1] // 2, 2).sum((1, 3))

        def cu_sum(x):  # per-TU grid -> per-CU grid
            if fT == 1:
                return x
            return x.reshape(nbh, fT, nbw, fT).sum((1, 3))

        # chroma (packed [U | V], TU size Tc per half). A 64 CU's forced
        # luma split to 4x32 TUs carries chroma down with it: leaf chroma
        # TUs are 16x16, not one 32x32 (§7.3.8.8 transform tree).
        Sc = S // 2
        Tc = 16 if S == 64 else min(Sc, 32)
        log2c = Tc.bit_length() - 1
        fTc = Sc // Tc
        Hpc, Wpc = Hp // 2, Wp // 2
        if mv_cells is not None:
            mvq_c = jnp.stack([up(mv_cells[..., 0], 4),
                               up(mv_cells[..., 1], 4)], -1)
            refc = up(ref_cells, 4)
        else:
            mvq_c = jnp.stack([up(mv_grid[..., 0], Sc),
                               up(mv_grid[..., 1], Sc)], -1)
            refc = up(ref_grid, Sc)
        pu = pred_chroma(pl_u, mvq_c, refc, Hpc, Wpc)
        pv = pred_chroma(pl_v, mvq_c, refc, Hpc, Wpc)
        pred_uv = jnp.concatenate([pu, pv], axis=1)  # (Hpc, 2*Wpc)
        ouv_c = jnp.concatenate([ouv[:Hpc, :Wpc], ouv[:Hpc, Wc : Wc + Wpc]],
                                axis=1)
        # HM weights chroma distortion by 2^((qp-qpc)/3) in RD (TEncSlice
        # setUpLambda): equivalently chroma-only decisions use lam/wch
        wch = jnp.float32(2.0 ** ((qp - qpc) / 3.0))
        lam_c = lam / wch

        def _txq_chroma(Tc_):
            log2c_ = Tc_.bit_length() - 1
            coef_c = fwd_tx(ouv_c - pred_uv, Tc_)
            if use_rdoq:
                lvl_c = rdoq_plane(coef_c, qpc, log2c_, lam_c,
                                   tabs["est_c"][log2c_])
            else:
                lvl_c = quant_plane(coef_c, qpc, log2c_)
            if use_sbh:
                lvl_c = sbh_plane(lvl_c, ideal_plane(coef_c, qpc, log2c_))
            rsd_c = inv_tx(deq_plane(lvl_c, qpc, log2c_), Tc_)
            rec_c = jnp.clip(pred_uv + rsd_c, 0, maxv)
            nzc = tile_sum((lvl_c != 0).astype(jnp.int32), Tc_)
            rec_c = jnp.where(up(nzc > 0, Tc_), rec_c, pred_uv)
            dc_s = tile_sum((ouv_c - pred_uv) ** 2, Tc_).astype(jnp.float32)
            dc_c = tile_sum((ouv_c - rec_c) ** 2, Tc_).astype(jnp.float32)
            estc = tabs["est_c"][log2c_]
            bits_ctu = estc.tu_bits(
                jnp, plane_tiles(lvl_c, Tc_, Hpc, 2 * Wpc),
                sbh=use_sbh).reshape(nzc.shape)
            cbfc_b = tabs["cbf_c"]
            drop_c = (dc_s + lam_c * cbfc_b[0]
                      <= dc_c + lam_c * (bits_ctu + cbfc_b[1]))
            dropp_c = up(drop_c, Tc_)
            lvl_c = jnp.where(dropp_c, 0, lvl_c)
            rec_c = jnp.where(dropp_c, pred_uv, rec_c)
            duv = jnp.where(drop_c, dc_s, dc_c)
            buv = jnp.where(drop_c, cbfc_b[0], bits_ctu + cbfc_b[1])
            nzk = jnp.where(drop_c, 0, nzc)
            return lvl_c, rec_c, duv, buv, nzk, dc_s

        lvl_c, rec_c, duv, buv, nzk, dc0 = _txq_chroma(Tc)

        split_tu = None
        td8 = None
        if do_split:
            # one-level RQT: per T-tile compare TU=T (vs 4x TU=T/2 with
            # chroma at Tc/2) by total weighted cost + the split-flag bit
            # delta. The chroma Tc grid is 1:1 with the luma T grid: Tc
            # == T//2 for every class (S <= 32: Tc = S/2; S == 64: T =
            # 32, Tc = 16), so the per-T-tile choice maps directly.
            assert Tc == T // 2
            Tc2 = Tc // 2  # >= 4 (S >= 16 here)
            lvl_c2, rec_c2, duv2, buv2, nzk2, _ = _txq_chroma(Tc2)
            # depth-2 RQT (QuadtreeTUMaxDepthInter 3 in the anchor cfg,
            # encoder depth 2: leaves stay >= luma 8 / chroma 4, which
            # both writers carry; TEncSearch::xEstimateInterResidualQT's
            # recursive compare, bottom-up): settle each T/2 subtile
            # between leaf-T/2 and 4x T/4 FIRST, then let the existing
            # T-level compare see the composite.
            # S == 32 only: a 64 CU's forced split to 32 already holds
            # tree depth 1, so its explicit splits stop at 16 leaves
            # (trafoDepth < MaxTrafoDepth gates the flag, §7.3.8.8) —
            # exactly what the one-level path above codes
            deep = (S == 32 and sps.max_tu_depth_inter >= 2
                    and _TUNE.get("tusplit2", True))
            split16 = None
            if deep:
                T4 = T // 4
                lvl4, rec4, d_tu4, b_tu4, cbf_tu4, _ = _txq_luma(
                    oy_c, pred_y, T4, qp, lam, tabs, Hp, Wp)
                Tc4 = Tc2 // 2  # 4
                lvl_c4, rec_c4, duv4, buv4, nzk4, _ = _txq_chroma(Tc4)

                def t2sum(x):  # T4 grid -> T2 grid
                    return x.reshape(x.shape[0] // 2, 2,
                                     x.shape[1] // 2, 2).sum((1, 3))

                def csum4(x):  # Tc4 chroma (packed) -> T2-tile grid
                    ntw = x.shape[1] // 2
                    u_ = x[:, :ntw].reshape(Hpc // Tc2, 2,
                                            Wpc // Tc2, 2).sum((1, 3))
                    v_ = x[:, ntw:].reshape(Hpc // Tc2, 2,
                                            Wpc // Tc2, 2).sum((1, 3))
                    return u_ + v_

                def c0sum2(x):  # Tc2 chroma (packed) -> T2-tile grid
                    ntw = x.shape[1] // 2
                    return x[:, :ntw] + x[:, ntw:]

                sd16 = (tabs["tsplit"][log2t - 1][1]
                        - tabs["tsplit"][log2t - 1][0])
                c16a = (d_tu2 + wch * c0sum2(duv2)
                        + lam * (b_tu2 + c0sum2(buv2)))
                c16b = (t2sum(d_tu4) + wch * csum4(duv4)
                        + lam * (t2sum(b_tu4) + csum4(buv4) + sd16))
                split16 = c16b < c16a  # per T/2 subtile
                sp2 = up(split16, T // 2)
                lvl2 = jnp.where(sp2, lvl4, lvl2)
                rec2 = jnp.where(sp2, rec4, rec2)
                d_tu2 = jnp.where(split16, t2sum(d_tu4), d_tu2)
                b_tu2 = jnp.where(split16, t2sum(b_tu4) + sd16, b_tu2)
                cbf_tu2 = jnp.where(split16, t2sum(cbf_tu4), cbf_tu2)
                spc2 = jnp.concatenate([up(split16, Tc2)] * 2, axis=1)
                lvl_c2 = jnp.where(spc2, lvl_c4, lvl_c2)
                rec_c2 = jnp.where(spc2, rec_c4, rec_c2)

                def csel2(base, fine):  # pick per Tc2 tile
                    ntw4 = fine.shape[1] // 2
                    fu = fine[:, :ntw4].reshape(
                        Hpc // Tc2, 2, Wpc // Tc2, 2).sum((1, 3))
                    fv = fine[:, ntw4:].reshape(
                        Hpc // Tc2, 2, Wpc // Tc2, 2).sum((1, 3))
                    fpk = jnp.concatenate([fu, fv], axis=1)
                    sel = jnp.concatenate([split16] * 2, axis=1)
                    return jnp.where(sel, fpk, base)

                duv2 = csel2(duv2, duv4)
                buv2 = csel2(buv2, buv4)
                nzk2 = csel2(nzk2, nzk4)

            def csum(x):  # Tc2 chroma grid (packed) -> T-tile grid
                ntw = x.shape[1] // 2
                u_ = x[:, :ntw].reshape(Hpc // Tc, 2,
                                        Wpc // Tc, 2).sum((1, 3))
                v_ = x[:, ntw:].reshape(Hpc // Tc, 2,
                                        Wpc // Tc, 2).sum((1, 3))
                return u_ + v_

            def c0sum(x):  # base Tc chroma grid (packed) -> T-tile grid
                ntw = x.shape[1] // 2
                return x[:, :ntw] + x[:, ntw:]

            sdelta = tabs["tsplit"][log2t][1] - tabs["tsplit"][log2t][0]
            cost_a = (d_tu + wch * c0sum(duv) + lam * (b_tu + c0sum(buv)))
            cost_b = (t_sum(d_tu2) + wch * csum(duv2)
                      + lam * (t_sum(b_tu2) + csum(buv2) + sdelta))
            split_tu = cost_b < cost_a  # per T-tile
            spp = up(split_tu, T)
            lvl = jnp.where(spp, lvl2, lvl)
            rec = jnp.where(spp, rec2, rec)
            d_tu = jnp.where(split_tu, t_sum(d_tu2), d_tu)
            b_tu = jnp.where(split_tu, t_sum(b_tu2) + sdelta, b_tu)
            cbf_tu = jnp.where(split_tu, t_sum(cbf_tu2), cbf_tu)
            spc = jnp.concatenate([up(split_tu, Tc)] * 2, axis=1)
            lvl_c = jnp.where(spc, lvl_c2, lvl_c)
            rec_c = jnp.where(spc, rec_c2, rec_c)
            sel_cp = jnp.concatenate([split_tu] * 2, axis=1)

            def csel(base, fine):  # pick per base-Tc tile
                fu = fine[:, : fine.shape[1] // 2].reshape(
                    Hpc // Tc, 2, Wpc // Tc, 2).sum((1, 3))
                fv = fine[:, fine.shape[1] // 2 :].reshape(
                    Hpc // Tc, 2, Wpc // Tc, 2).sum((1, 3))
                fpk = jnp.concatenate([fu, fv], axis=1)
                return jnp.where(sel_cp, fpk, base)

            duv = csel(duv, duv2)
            buv = csel(buv, buv2)
            nzk = csel(nzk, nzk2)
            # per-8-cell RQT depth map (0/1/2) for the writers
            td8 = up(split_tu.astype(jnp.int8), T // 8)
            if split16 is not None:
                td8 = td8 + (up(split_tu, T // 8)
                             & up(split16, T // 16)).astype(jnp.int8)

        def cu_sum_c(x):  # per-chroma-TU grid (packed) -> per-CU grid
            ntw = x.shape[1] // 2
            u_, v_ = x[:, :ntw], x[:, ntw:]
            if fTc > 1:
                u_ = u_.reshape(nbh, fTc, nbw, fTc).sum((1, 3))
                v_ = v_.reshape(nbh, fTc, nbw, fTc).sum((1, 3))
            return u_ + v_

        d_cu = cu_sum(d_tu) + wch * cu_sum_c(duv)
        b_cu = cu_sum(b_tu) + cu_sum_c(buv)
        cbf_cu = cu_sum(cbf_tu) + cu_sum_c(nzk)
        d0_cu = cu_sum(d0_tu) + wch * cu_sum_c(dc0)
        out = dict(lvl=lvl, rec=rec, lvl_c=lvl_c, rec_c=rec_c,
                   d=d_cu, bits=b_cu, cbf=cbf_cu > 0, d0=d0_cu,
                   pred=pred_y, pred_c=pred_uv)
        if split_tu is not None:
            out["tsplit"] = split_tu  # per T-tile bool
            out["td8"] = td8          # per-8-cell RQT depth (0/1/2)
        return out

    # --- intra-in-P: dense 16x16 intra candidate class -------------------
    # The anchor's RD win in occlusion regions comes from intra CUs
    # inside P slices (TEncCu.cpp:644, 9% of CUs at QP22 on the
    # scoreboard clip). Decision is open-loop (original-pixel
    # references); reconstruction is exact: kept cells are constrained
    # so every reference sample comes from already-final inter recon,
    # with the spec's z-scan availability + substitution (§8.4.4.2.2).
    IMODES = (0, 1, 10, 26, 2, 18, 34)  # planar, DC, H, V, diagonals

    from ..ops.intra import filter_flag as _filter_mode

    def _intra_static():
        """z-scan availability of the TR / BL 16-sample segments per
        16-cell (min-CU z-addresses are static; §6.4.1)."""
        ctu_cells = max(1, (1 << sps.log2_ctu) // 16)
        wctu_ = -(-nw16 // ctu_cells)
        zz = np.zeros((nh16, nw16), np.int64)
        for by in range(nh16):
            for bx in range(nw16):
                cy, cx = by // ctu_cells, bx // ctu_cells
                oy_, ox_ = by % ctu_cells, bx % ctu_cells
                m = 0
                for b_ in range(6):
                    m |= (((ox_ >> b_) & 1) << (2 * b_)) \
                        | (((oy_ >> b_) & 1) << (2 * b_ + 1))
                zz[by, bx] = ((cy * wctu_ + cx) << 16) + m
        tr = np.zeros((nh16, nw16), bool)
        bl = np.zeros((nh16, nw16), bool)
        for by in range(nh16):
            for bx in range(nw16):
                if by > 0 and bx + 1 < nw16:
                    tr[by, bx] = zz[by - 1, bx + 1] < zz[by, bx]
                if by + 1 < nh16 and bx > 0:
                    bl[by, bx] = zz[by + 1, bx - 1] < zz[by, bx]
        return tr, bl

    _AVTR16, _AVBL16 = (None, None)
    if nh16 and nw16:
        _AVTR16, _AVBL16 = _intra_static()

    def cell_refs(plane, S, ox, hp, wp):
        """(nh16*nw16, 2S+1) top/left reference arrays (corner at 0)
        from `plane`, with z-availability + substitution. ox: x offset
        of the cell grid inside the plane (packed-V half)."""
        n = n16
        bx = np.tile(np.arange(nw16), nh16) * S + ox
        by = np.repeat(np.arange(nh16), nw16) * S
        bxj = jnp.asarray(bx)[:, None]
        byj = jnp.asarray(by)[:, None]
        # boundary vector v[k], k=0..4S: left bottom-up (incl BL), TL,
        # top left-to-right (incl TR)
        kk = np.arange(4 * S + 1)
        is_left = kk < 2 * S
        ky = np.where(is_left, (2 * S - 1) - kk, -1)
        kx = np.where(is_left, -1, np.where(kk == 2 * S, -1,
                                            kk - (2 * S + 1)))
        yy = jnp.clip(byj + jnp.asarray(ky)[None], 0, hp - 1)
        xx = jnp.clip(bxj + jnp.asarray(kx)[None], 0,
                      (ox + nw16 * S) - 1 if ox else wp - 1)
        v = jnp.take(plane.reshape(-1), yy * wp + xx)  # (n, 4S+1)
        # availability per k
        avtr = jnp.asarray(_AVTR16.reshape(-1))
        avbl = jnp.asarray(_AVBL16.reshape(-1))
        left_ok = jnp.asarray((bx - ox) > 0)
        top_ok = jnp.asarray(by > 0)
        seg_bl = jnp.asarray(kk < S)[None]
        seg_l = jnp.asarray((kk >= S) & (kk < 2 * S))[None]
        seg_tl = jnp.asarray(kk == 2 * S)[None]
        seg_t = jnp.asarray((kk > 2 * S) & (kk <= 3 * S))[None]
        seg_tr = jnp.asarray(kk > 3 * S)[None]
        inb_y = (byj + jnp.asarray(ky)[None]) < hp
        inb_x = (bxj + jnp.asarray(kx)[None]) < (
            ox + nw16 * S if ox else wp)
        av = (seg_bl & (avbl & left_ok)[:, None] & inb_y) \
            | (seg_l & left_ok[:, None]) \
            | (seg_tl & (left_ok & top_ok)[:, None]) \
            | (seg_t & top_ok[:, None]) \
            | (seg_tr & (avtr & top_ok)[:, None] & inb_x)
        # substitution: forward fill from the first available
        ffi = jax.lax.cummax(
            jnp.where(av, jnp.arange(4 * S + 1)[None], -1), axis=1)
        first = jnp.argmax(av, axis=1)
        any_av = av.any(axis=1)
        vf = jnp.take_along_axis(v, jnp.maximum(ffi, 0), 1)
        v0 = jnp.take_along_axis(v, first[:, None], 1)
        filled = jnp.where(ffi >= 0, vf, v0)
        filled = jnp.where(any_av[:, None], filled,
                           jnp.full_like(filled, 1 << (bd - 1)))
        corner = filled[:, 2 * S : 2 * S + 1]
        t = jnp.concatenate([corner, filled[:, 2 * S + 1 :]], axis=1)
        lft = jnp.concatenate([corner, filled[:, 2 * S - 1 :: -1]],
                              axis=1)
        return t.astype(jnp.int32), lft.astype(jnp.int32)

    def _smooth121(t, lft, S):
        s2 = 2 * S
        c = (lft[:, 1] + 2 * t[:, 0] + t[:, 1] + 2) >> 2
        tm = (t[:, : s2 - 1] + 2 * t[:, 1:s2] + t[:, 2:] + 2) >> 2
        lm = (lft[:, : s2 - 1] + 2 * lft[:, 1:s2] + lft[:, 2:] + 2) >> 2
        ft = jnp.concatenate([c[:, None], tm, t[:, s2:]], axis=1)
        fl = jnp.concatenate([c[:, None], lm, lft[:, s2:]], axis=1)
        return ft, fl

    def intra_preds(t, lft, S, is_luma):
        """(n, len(IMODES), S, S) predictions; [1 2 1] smoothing per
        filter_flag (luma only), DC/V/H post filters (luma, S<32)."""
        n = t.shape[0]
        log2 = S.bit_length() - 1
        if is_luma and log2 in (3, 4):
            ft, fl = _smooth121(t, lft, S)
        else:
            ft, fl = t, lft
        xs = jnp.arange(S)
        preds = []
        for m in IMODES:
            tt, ll = (ft, fl) if (is_luma and _filter_mode(m, log2)) \
                else (t, lft)
            if m == 0:  # planar
                p = ((S - 1 - xs[None, None, :]) * ll[:, 1 : S + 1, None]
                     + (xs[None, None, :] + 1) * tt[:, S + 1, None, None]
                     + (S - 1 - xs[None, :, None]) * tt[:, None, 1 : S + 1]
                     + (xs[None, :, None] + 1) * ll[:, S + 1, None, None]
                     + S) >> (log2 + 1)
            elif m == 1:  # DC + boundary filter
                dc = ((tt[:, 1 : S + 1].sum(1) + ll[:, 1 : S + 1].sum(1)
                       + S) >> (log2 + 1))
                p = jnp.broadcast_to(dc[:, None, None], (n, S, S))
                if is_luma:
                    row0 = (tt[:, 2 : S + 1] + 3 * dc[:, None] + 2) >> 2
                    col0 = (ll[:, 2 : S + 1] + 3 * dc[:, None] + 2) >> 2
                    c00 = (ll[:, 1] + 2 * dc + tt[:, 1] + 2) >> 2
                    p = p.at[:, 0, 1:].set(row0)
                    p = p.at[:, 1:, 0].set(col0)
                    p = p.at[:, 0, 0].set(c00)
            elif m == 26:  # vertical
                p = jnp.broadcast_to(tt[:, None, 1 : S + 1], (n, S, S))
                if is_luma:
                    col0 = jnp.clip(
                        tt[:, 1, None] + ((ll[:, 1 : S + 1] - ll[:, 0,
                                                                 None])
                                          >> 1), 0, maxv)
                    p = p.at[:, :, 0].set(col0)
            elif m == 10:  # horizontal
                p = jnp.broadcast_to(ll[:, 1 : S + 1, None], (n, S, S))
                if is_luma:
                    row0 = jnp.clip(
                        ll[:, 1, None] + ((tt[:, 1 : S + 1] - tt[:, 0,
                                                                  None])
                                          >> 1), 0, maxv)
                    p = p.at[:, 0, :].set(row0)
            elif m == 2:
                p = ll[:, 2:][:, xs[:, None] + xs[None, :]]
            elif m == 34:
                p = tt[:, 2:][:, xs[:, None] + xs[None, :]].transpose(
                    0, 2, 1)
            else:  # m == 18: top-left diagonal
                comb = jnp.concatenate([ll[:, :0:-1], tt], axis=1)
                idx = 2 * S + xs[None, :] - xs[:, None]
                p = comb[:, idx]
            preds.append(p.astype(jnp.int32))
        return jnp.stack(preds, axis=1)

    def satd_cells(res, S):
        """(n, S, S) residual -> (n,) 8x8-Hadamard SATD."""
        Hm = jnp.asarray(_HAD8)
        f = S // 8
        r = (res.reshape(-1, f, 8, f, 8).transpose(0, 1, 3, 2, 4)
             .reshape(-1, 8, 8))
        v = jnp.einsum("kj,bjx->bkx", Hm, r)
        hh = jnp.einsum("kj,bxj->bxk", Hm, v)
        s = (jnp.abs(hh).sum((1, 2)) + 2) >> 2
        return s.reshape(-1, f * f).sum(1)

    def cells_to_plane(c, S, nbh, nbw):
        return (c.reshape(nbh, nbw, S, S).transpose(0, 2, 1, 3)
                .reshape(nbh * S, nbw * S))

    def intra16_class(qp, tabs, lam, lam_me_f, oy, ouv):
        """Open-loop intra-16 candidate: best of IMODES per cell by
        SATD, then full TXQ RD (luma TU16 + chroma TU8). Returns
        (cost (nh16,nw16), mode (n16,), intra_pred builder inputs)."""
        qpc = chroma_qp(qp)
        t, lft = cell_refs(oy, 16, 0, H, W)
        preds = intra_preds(t, lft, 16, True)               # (n,7,16,16)
        cur = (oy[: nh16 * 16, : nw16 * 16]
               .reshape(nh16, 16, nw16, 16).transpose(0, 2, 1, 3)
               .reshape(n16, 16, 16))
        sat = jnp.stack([satd_cells(cur - preds[:, i], 16)
                         for i in range(len(IMODES))], 1)
        bm = jnp.argmin(sat, axis=1)                        # (n16,)
        pred = jnp.take_along_axis(
            preds, bm[:, None, None, None].repeat(16, 2).repeat(16, 3),
            1)[:, 0]
        pred_y = cells_to_plane(pred, 16, nh16, nw16)
        # chroma DM prediction from the packed [U|V] recon/original
        tu, lu = cell_refs(ouv, 8, 0, Hc, W)
        tv, lv_ = cell_refs(ouv, 8, Wc, Hc, W)
        pu = intra_preds(tu, lu, 8, False)
        pv = intra_preds(tv, lv_, 8, False)
        sel = bm[:, None, None, None].repeat(8, 2).repeat(8, 3)
        pu1 = jnp.take_along_axis(pu, sel, 1)[:, 0]
        pv1 = jnp.take_along_axis(pv, sel, 1)[:, 0]
        pred_uv = jnp.concatenate(
            [cells_to_plane(pu1, 8, nh16, nw16),
             cells_to_plane(pv1, 8, nh16, nw16)], axis=1)
        return bm, pred_y, pred_uv

    def intra16_code(qp, tabs, lam, oy, ouv, pred_y, pred_uv):
        """TXQ-code the intra pred planes (luma TU16, chroma TU8);
        returns dict(lvl, rec, lvl_c, rec_c, d, bits, cbf) per 16-cell
        grid — same contract as class_code."""
        qpc = chroma_qp(qp)
        Hp, Wp = nh16 * 16, nw16 * 16
        oy_c = oy[:Hp, :Wp]
        coef = fwd_tx(oy_c - pred_y, 16)
        if use_rdoq:
            lvl = rdoq_plane(coef, qp, 4, lam, tabs["est_y"][4])
        else:
            lvl = quant_plane(coef, qp, 4)
        if use_sbh:
            lvl = sbh_plane(lvl, ideal_plane(coef, qp, 4))
        rsd = inv_tx(deq_plane(lvl, qp, 4), 16)
        rec = jnp.clip(pred_y + rsd, 0, maxv)
        nzb = tile_sum((lvl != 0).astype(jnp.int32), 16)
        rec = jnp.where(up(nzb > 0, 16), rec, pred_y)
        d_skip = tile_sum((oy_c - pred_y) ** 2, 16).astype(jnp.float32)
        d_coded = tile_sum((oy_c - rec) ** 2, 16).astype(jnp.float32)
        est = tabs["est_y"][4]
        bits_tu = est.tu_bits(jnp, plane_tiles(lvl, 16, Hp, Wp),
                              sbh=use_sbh).reshape(nzb.shape)
        cbf_b = tabs["cbf_y"]
        drop = (d_skip + lam * cbf_b[0]
                <= d_coded + lam * (bits_tu + cbf_b[1]))
        dropp = up(drop, 16)
        lvl = jnp.where(dropp, 0, lvl)
        rec = jnp.where(dropp, pred_y, rec)
        d_cu = jnp.where(drop, d_skip, d_coded)
        b_cu = jnp.where(drop, cbf_b[0], bits_tu + cbf_b[1])
        cbf_cu = jnp.where(drop, 0, nzb)
        # chroma (packed [U|V], 8x8 TUs)
        Hpc, Wpc = Hp // 2, Wp // 2
        ouv_c = jnp.concatenate([ouv[:Hpc, :Wpc],
                                 ouv[:Hpc, Wc : Wc + Wpc]], axis=1)
        wch = jnp.float32(2.0 ** ((qp - qpc) / 3.0))
        lam_c = lam / wch
        coef_c = fwd_tx(ouv_c - pred_uv, 8)
        if use_rdoq:
            lvl_c = rdoq_plane(coef_c, qpc, 3, lam_c, tabs["est_c"][3])
        else:
            lvl_c = quant_plane(coef_c, qpc, 3)
        if use_sbh:
            lvl_c = sbh_plane(lvl_c, ideal_plane(coef_c, qpc, 3))
        rsd_c = inv_tx(deq_plane(lvl_c, qpc, 3), 8)
        rec_c = jnp.clip(pred_uv + rsd_c, 0, maxv)
        nzc = tile_sum((lvl_c != 0).astype(jnp.int32), 8)
        rec_c = jnp.where(up(nzc > 0, 8), rec_c, pred_uv)
        dc_s = tile_sum((ouv_c - pred_uv) ** 2, 8).astype(jnp.float32)
        dc_c = tile_sum((ouv_c - rec_c) ** 2, 8).astype(jnp.float32)
        estc = tabs["est_c"][3]
        bits_ctu = estc.tu_bits(jnp, plane_tiles(lvl_c, 8, Hpc, 2 * Wpc),
                                sbh=use_sbh).reshape(nzc.shape)
        cbfc_b = tabs["cbf_c"]
        drop_c = (dc_s + lam_c * cbfc_b[0]
                  <= dc_c + lam_c * (bits_ctu + cbfc_b[1]))
        dropp_c = up(drop_c, 8)
        lvl_c = jnp.where(dropp_c, 0, lvl_c)
        rec_c = jnp.where(dropp_c, pred_uv, rec_c)
        duv = jnp.where(drop_c, dc_s, dc_c)
        buv = jnp.where(drop_c, cbfc_b[0], bits_ctu + cbfc_b[1])
        nzk = jnp.where(drop_c, 0, nzc)

        def cu_sum_c(x):
            ntw = x.shape[1] // 2
            return x[:, :ntw] + x[:, ntw:]

        d_cu = d_cu + wch * cu_sum_c(duv)
        b_cu = b_cu + cu_sum_c(buv)
        cbf_cu = cbf_cu + cu_sum_c(nzk)
        return dict(lvl=lvl, rec=rec, lvl_c=lvl_c, rec_c=rec_c,
                    d=d_cu, bits=b_cu, cbf=cbf_cu > 0)

    def intra16_cost(tabs, lam, ci):
        """Total RD cost of the intra-16 candidate per cell (header =
        skip0 + pred_mode intra + approx mode bits; no part_mode at
        non-min intra, §7.3.8.5)."""
        hdr = (tabs["skip0"] + tabs["pred_intra"]
               + tabs["prev_mode"][0] + 5.0 + tabs["chroma_dm"] + 1.0)
        bits = hdr + ci["bits"] + tabs["split"][0]
        return ci["d"] + lam * bits

    def intra_suppress(cand):
        """Deterministic 4-phase keep mask: a kept cell never uses
        another (potentially) intra cell's reconstruction as reference
        — providers: left, top-left, top, z-available TR and BL."""
        def prov(m):
            pl = jnp.pad(m, ((0, 0), (1, 0)))[:, :-1]
            pt = jnp.pad(m, ((1, 0), (0, 0)))[:-1]
            ptl = jnp.pad(m, ((1, 0), (1, 0)))[:-1, :-1]
            ptr = jnp.pad(m, ((1, 0), (0, 1)))[:-1, 1:] \
                & jnp.asarray(_AVTR16)
            pbl = jnp.pad(m, ((0, 1), (1, 0)))[1:, :-1] \
                & jnp.asarray(_AVBL16)
            return pl | pt | ptl | ptr | pbl

        bxg = np.arange(nw16)[None].repeat(nh16, 0)
        byg = np.arange(nh16)[:, None].repeat(nw16, 1)
        kept = jnp.zeros((nh16, nw16), bool)
        decided = jnp.zeros((nh16, nw16), bool)
        for px_, py_ in ((0, 0), (1, 0), (0, 1), (1, 1)):
            ph = jnp.asarray((bxg % 2 == px_) & (byg % 2 == py_))
            blocked = prov(kept) | prov(cand & ~decided)
            kept = kept | (cand & ph & ~blocked)
            decided = decided | ph
        return kept

    def cu_cost(tabs, lam, c, mode_b, merged, midx_b, S):
        """Total RD cost per CU incl. skip/merge/amvp syntax and the
        split flag this CU would code (min CU 8 codes none)."""
        cbf = c["cbf"]
        # cbf==0 & merged -> SKIP (cheapest); cbf==0 & amvp -> root_cbf 0
        syn_skip = tabs["skip1"] + midx_b
        syn_code = tabs["skip0"] + mode_b + jnp.where(
            merged, 0.0, jnp.where(cbf, tabs["root1"], tabs["root0"]))
        syn = jnp.where(~cbf & merged, syn_skip, syn_code)
        bits = syn + jnp.where(cbf, c["bits"], 0.0)
        if S > 8:
            bits = bits + tabs["split"][0]
        return c["d"] + lam * bits, bits

    def frame_step(ref, fu8, navail, gpos, wp=None, live=None):
        # carry: reference stacks + prev-frame full-pel 16-MV seed +
        # prev-frame TMVP collocated motion (16x16-compressed final MVs
        # and POC distance col->ref per block, 0 = intra/invalid)
        ry_stack, ruv_stack, mv16p, colmv_g, coltd_g = ref
        qp = qps[gpos]
        tabs = tabs_by_qp[qp]
        if live is not None:  # adaptive re-freeze: overlay traced tables
            tabs = _tabs_with_live(tabs, live[gpos])
        # full HM picture lambda incl. the QPfactor column and the
        # depth>0 hierarchy multiplier (TEncSlice.cpp:283-325)
        lam_py = p_frame_lambda(cfg, gpos, qp)
        lam = jnp.float32(lam_py)
        lam_me_f = jnp.float32(np.sqrt(lam_py))
        lam_me = int(round(np.sqrt(lam_py) * 256))
        oy = fu8[: W * H].reshape(H, W).astype(jnp.int32)
        ou = fu8[W * H : W * H * 5 // 4].reshape(Hc, Wc)
        ov = fu8[W * H * 5 // 4 :].reshape(Hc, Wc)
        ouv = jnp.concatenate([ou, ov], axis=1).astype(jnp.int32)

        # --- ME over every L0 reference; per-block best ref by cost ----
        # ref 0 gets the full candidate set (coarse + zero + global +
        # temporal seed); refs 1..R-1 run one scaled-coarse grid each
        # inside a lax.scan so the traced graph holds ONE extra-ref body
        # instead of R-1 copies (compile time).
        if use_wp:
            # per-ref weighted full-pel search references (the clipped
            # SAD form of xCalcSADvalueWPOptionalClip): the decision
            # stages see illumination-compensated references; the
            # normative weighting rides the MC phase planes below
            wpw, wpo, wpd = wp
            rnd_me = (jnp.int32(1) << wpd) >> 1
            ry_stack_me = jnp.clip(
                ((ry_stack * wpw[:, 0][:, None, None] + rnd_me) >> wpd)
                + wpo[:, 0][:, None, None], 0, maxv)
        else:
            ry_stack_me = ry_stack
        oy2 = tile_sum(oy, 2).astype(jnp.int16)
        ry0 = ry_stack_me[0]
        ry2p = jnp.pad(tile_sum(ry0, 2).astype(jnp.int16), R2,
                       mode="edge")
        s16c, sum16c = coarse_stack(oy2, ry2p)
        cx16, cy16 = pick_coarse(s16c, sum16c, qp, lam_me, nh16, nw16, 1)
        cx32 = cy32 = None
        if has32:
            cx32, cy32 = pick_coarse(s16c, sum16c, qp, lam_me,
                                     nh32, nw32, 2)
        gtot = s16c
        if zme:
            gtot = _zc(s16c, sum16c, _dcc(qp, 16 * 16, lam_me))
        gi = jnp.argmin(gtot.sum((1, 2)))
        gcand = (gi % nc - R2, gi // nc - R2)
        tx_ = jnp.clip(mv16p[:, 0], -sr_full, sr_full).reshape(nh16, nw16)
        ty_ = jnp.clip(mv16p[:, 1], -sr_full, sr_full).reshape(nh16, nw16)
        tseed = (tx_, ty_)

        # long-range prestage (SearchRange > 16): dense +-16-unit SAD on
        # the 4x-pooled pyramid level, per-16-block winner seeds one
        # extra refine grid (the TZ raster-stage counterpart,
        # TEncSearch.cpp:4953)
        pre16 = pre32 = None
        if sr_full > sr:
            P4 = sr_full // 4
            n4 = 2 * P4 + 1
            oy4 = tile_sum(oy, 4).astype(jnp.int16)
            ry4p = jnp.pad(tile_sum(ry0, 4).astype(jnp.int16),
                           P4, mode="edge")

            def ps_row(carry, dy):
                best, barg = carry
                for dxi in range(n4):
                    sl = jax.lax.dynamic_slice(
                        ry4p, (dy, dxi), (H // 4, W // 4))
                    d = (sl - oy4).astype(jnp.int32)
                    c = tile_sum(jnp.abs(d), 4) << 2
                    mvyq = 16.0 * jnp.abs(dy - P4).astype(jnp.float32)
                    bb = (2 * jnp.ceil(jnp.log2(2.0 * mvyq + 1.0))
                          + 2 * np.ceil(np.log2(
                              2.0 * abs(16 * (dxi - P4)) + 1.0))
                          + 2).astype(jnp.int32)
                    cost = c + ((bb * lam_me) >> 8)
                    idx = dy * n4 + dxi
                    take = cost < best
                    best = jnp.where(take, cost, best)
                    barg = jnp.where(take, idx, barg)
                return (best, barg), None

            init = (jnp.full((nh16, nw16), 1 << 30, jnp.int32),
                    jnp.zeros((nh16, nw16), jnp.int32))
            (_, barg), _ = jax.lax.scan(ps_row, init, jnp.arange(n4))
            lim_ps = sr_full - 4
            px_ = jnp.clip((barg % n4 - P4) * 4, -lim_ps, lim_ps)
            py_ = jnp.clip((barg // n4 - P4) * 4, -lim_ps, lim_ps)
            pre16 = (px_, py_)
            if has32:
                pre32 = (px_[: nh32 * 2 : 2, : nw32 * 2 : 2],
                         py_[: nh32 * 2 : 2, : nw32 * 2 : 2])

        def left2(g, nbh_, nbw_):
            """Coarse-unit grid (any layout) -> full-pel left-neighbor
            grid: the batched AMVP-predictor proxy for the ME rate."""
            g2 = g.reshape(nbh_, nbw_)
            return jnp.concatenate([g2[:, :1], g2[:, :-1]], 1) * 2

        def ref0_class(S, nbh_, nbw_, cxr, cyr, ts, quads=False,
                       pre=None):
            return refine(ry0, oy, cxr, cyr, S, nbh_, nbw_, qp, lam_me,
                          with_zero=True, global_c=gcand, extra_c=ts,
                          extra_c2=pre, want_quads=quads,
                          anchor_c=(left2(cxr, nbh_, nbw_),
                                    left2(cyr, nbh_, nbw_)))

        # the 8-class rides the 16 windows (identical candidate sets to
        # an independent refine at the repeated-parent centers)
        *m16_0, q8_0 = ref0_class(16, nh16, nw16, cx16, cy16, tseed,
                                  quads=_TUNE["enable8"], pre=pre16) \
            if _TUNE["enable8"] else (*ref0_class(16, nh16, nw16, cx16,
                                                  cy16, tseed,
                                                  pre=pre16), None)
        m8_0 = q8_0
        if has32:
            ts32 = (tseed[0][: nh32 * 2 : 2, : nw32 * 2 : 2],
                    tseed[1][: nh32 * 2 : 2, : nw32 * 2 : 2])
            m32_0 = ref0_class(32, nh32, nw32, cx32, cy32, ts32,
                               pre=pre32)

        def acc_init(m, r0_bits):
            mv, sad9, cost = m
            return (cost + ((r0_bits * lam_me) >> 8) if R > 1 else cost,
                    mv, sad9, jnp.zeros(mv.shape[0], jnp.int32))

        acc16 = acc_init(m16_0, _REF_BITS[0])
        acc8 = acc_init(m8_0, _REF_BITS[0]) if _TUNE["enable8"] else None
        acc32 = acc_init(m32_0, _REF_BITS[0]) if has32 else None

        if R > 1:
            scales = jnp.arange(2, R + 1, dtype=jnp.int32)
            rbits = jnp.asarray([_REF_BITS[r] for r in range(1, R)],
                                jnp.int32)
            ridxs = jnp.arange(1, R, dtype=jnp.int32)

            def merge_acc(acc, m, rb, ridx):
                cost0, mv0, sad0, ref0_ = acc
                mv, sad9, cost = m
                cost = cost + ((rb * lam_me) >> 8)
                cost = jnp.where(ridx < navail, cost, jnp.int32(1 << 30))
                take = cost < cost0
                return (jnp.where(take, cost, cost0),
                        jnp.where(take[:, None], mv, mv0),
                        jnp.where(take[:, None], sad9, sad0),
                        jnp.where(take, ridx, ref0_))

            def ref_body(carry, xs):
                a16, a8, a32 = carry
                ryr, sc_, rb, ridx = xs
                cxr = jnp.clip(cx16 * sc_, -R2, R2)
                cyr = jnp.clip(cy16 * sc_, -R2, R2)
                anc = (left2(cxr, nh16, nw16), left2(cyr, nh16, nw16))
                if _TUNE["enable8"]:
                    *m16r, q8r = refine(ryr, oy, cxr, cyr, 16, nh16,
                                        nw16, qp, lam_me,
                                        with_zero=False, want_quads=True,
                                        anchor_c=anc)
                    a16 = merge_acc(a16, m16r, rb, ridx)
                    a8 = merge_acc(a8, q8r, rb, ridx)
                else:
                    a16 = merge_acc(a16, refine(ryr, oy, cxr, cyr, 16,
                                                nh16, nw16, qp, lam_me,
                                                with_zero=False,
                                                anchor_c=anc), rb,
                                    ridx)
                if has32:
                    cxr32 = jnp.clip(cx32 * sc_, -R2, R2)
                    cyr32 = jnp.clip(cy32 * sc_, -R2, R2)
                    a32 = merge_acc(
                        a32, refine(ryr, oy, cxr32, cyr32, 32,
                                    nh32, nw32, qp, lam_me,
                                    with_zero=False,
                                    anchor_c=(left2(cxr32, nh32, nw32),
                                              left2(cyr32, nh32, nw32))),
                        rb, ridx)
                return (a16, a8, a32), None

            (acc16, acc8, acc32), _ = jax.lax.scan(
                ref_body, (acc16, acc8, acc32),
                (ry_stack_me[1:], scales, rbits, ridxs))

        def pick_ref(acc):
            _, mv, sad9, refi = acc
            return mv, sad9, refi

        # MC phase planes for every reference (einsum-batched)
        planes_y = luma_planes_all(
            ry_stack, (wpw[:, 0], wpo[:, 0], wpd) if use_wp else None)
        pl_u, pl_v = chroma_planes_all(
            ruv_stack, (wpw[:, 1:], wpo[:, 1:], wpd) if use_wp else None)

        mv16, sad9_16, ref16 = pick_ref(acc16)
        if _TUNE["enable8"]:
            mv8, sad9_8, ref8 = pick_ref(acc8)
        if has32:
            mv32, sad9_32, ref32 = pick_ref(acc32)

        if cfg.fme_mode == "nn" and nn_dev.get(qp) is not None:
            # one batched MLP forward over every class's blocks
            parts = [(sad9_16, 16, n16)]
            if _TUNE["enable8"]:
                parts.append((sad9_8, 8, nh8 * nw8))
            if has32:
                parts.append((sad9_32, 32, n32))
            rows = jnp.concatenate([p[0] for p in parts]).astype(
                jnp.float32)
            hc = jnp.concatenate([
                jnp.full(p[2], int(nnfme.height_category(p[1])))
                for p in parts])
            wc = jnp.concatenate([
                jnp.full(p[2], int(nnfme.width_category(p[1])))
                for p in parts])
            logits = nnfme.forward(nn_dev[qp], rows, hc, wc)
            offs = cls2q[jnp.argmax(logits, axis=-1)].astype(jnp.int32)
            o16 = offs[:n16]
            pos = n16
            mvq16 = mv16 * 4 + o16
            if _TUNE["enable8"]:
                mvq8 = mv8 * 4 + offs[pos : pos + nh8 * nw8]
                pos += nh8 * nw8
            if has32:
                mvq32 = mv32 * 4 + offs[pos : pos + n32]
        else:
            def with_fme(mv, refv, S, nbh_, nbw_):
                if cfg.fme_mode == "dctif":
                    return subpel_refine(planes_y, oy, mv, refv, S, nbh_,
                                         nbw_)
                return mv * 4

            mvq16 = with_fme(mv16, ref16, 16, nh16, nw16)
            if _TUNE["enable8"]:
                mvq8 = with_fme(mv8, ref8, 8, nh8, nw8)
            if has32:
                mvq32 = with_fme(mv32, ref32, 32, nh32, nw32)

        # --- per-class candidate sweep + residual coding ---------------
        # use_tusplit (build-time capture, see top of build): depth >= 1
        # covers CU <= 32; the 64 CU's forced split to 32 already
        # consumes one level, so its split needs depth >= 2

        def code_candidate(mvg, refg, mode_b, mergeable, midx_b, S,
                           nbh, nbw):
            """Code one per-CU (mv, ref) candidate grid with the given
            mode syntax, apply the explicit SKIP trial
            (xCheckRDCostMerge2Nx2N's no-residual candidate,
            TEncCu.cpp:455 — the per-TU drops can't see the CU-level
            syntax saving), and return the planes dict + full RD cost."""
            c = class_code(qp, tabs, lam, oy, ouv, planes_y, pl_u, pl_v,
                           mvg, refg, S, nbh, nbw,
                           tusplit=use_tusplit and 16 <= S and
                           (S < 64 or sps.max_tu_depth_inter >= 2))
            cost, _ = cu_cost(tabs, lam, c, mode_b, mergeable, midx_b, S)
            skip_syn = tabs["skip1"] + midx_b
            if S > 8:
                skip_syn = skip_syn + tabs["split"][0]
            cost_skip = c["d0"] + lam * skip_syn
            force = mergeable & (cost_skip < cost)
            cost = jnp.where(force, cost_skip, cost)
            fp = up(force, S)
            c["lvl"] = jnp.where(fp, 0, c["lvl"])
            c["rec"] = jnp.where(fp, c["pred"], c["rec"])
            fc = jnp.concatenate([up(force, S // 2)] * 2, axis=1)
            c["lvl_c"] = jnp.where(fc, 0, c["lvl_c"])
            c["rec_c"] = jnp.where(fc, c["pred_c"], c["rec_c"])
            c["cbf"] = c["cbf"] & ~force
            if "tsplit" in c:
                ft = force.repeat(S // min(S, 32), 0).repeat(
                    S // min(S, 32), 1)
                c["tsplit"] = c["tsplit"] & ~ft
                f8 = up(force, S // 8)
                c["td8"] = jnp.where(f8, 0, c["td8"])
            c.update(mv=mvg, ref=refg, cost=cost)
            return c

        def run_class(mvq, refv, S, nbh, nbw, settled=None):
            if settled is None:
                settled = cand_sweep(
                    tabs, qp, lam_me_f, oy, planes_y,
                    mvq.reshape(nbh, nbw, 2), refv.reshape(nbh, nbw),
                    S, nbh, nbw)
            mvg, refg, mode_b, merged, midx_b = settled
            # a block whose OWN settled (mv, ref) equals its left/top
            # neighbor's is mergeable at walk time even though the sweep
            # never adopted (both found the same motion independently) —
            # align the decision costs with what the walk will emit
            eqL = jnp.concatenate(
                [jnp.zeros((nbh, 1), bool),
                 (mvg[:, 1:] == mvg[:, :-1]).all(-1)
                 & (refg[:, 1:] == refg[:, :-1])], axis=1)
            eqT = jnp.concatenate(
                [jnp.zeros((1, nbw), bool),
                 (mvg[1:] == mvg[:-1]).all(-1)
                 & (refg[1:] == refg[:-1])], axis=0)
            mergeable = merged | eqL | eqT
            midx_b = jnp.where(merged, midx_b,
                               jnp.asarray(tabs["midx"][0], jnp.float32))
            merge_mode_b = (tabs["pred_inter"] + tabs["part2n"]
                            + tabs["mf1"] + midx_b)
            mode_b = jnp.where(mergeable,
                               jnp.minimum(mode_b, merge_mode_b), mode_b)
            c = code_candidate(mvg, refg, mode_b, mergeable, midx_b, S,
                               nbh, nbw)
            if not _TUNE.get("merge_rd", True):
                return c
            # measured-RD merge arbitration (TEncCu.cpp:455-516): the
            # sweep's SATD + lambda_me bit proxy under-adopts exactly
            # where HM's full-RD merge trials win — at high QP the
            # mvd/ref syntax dwarfs the extra residual of the
            # neighbor's MV. Code the best spatial-neighbor candidate
            # as a merge outright and keep the measured-RD winner.
            mvL = jnp.concatenate([mvg[:, :1], mvg[:, :-1]], 1)
            refL = jnp.concatenate([refg[:, :1], refg[:, :-1]], 1)
            mvT = jnp.concatenate([mvg[:1], mvg[:-1]], 0)
            refT = jnp.concatenate([refg[:1], refg[:-1]], 0)
            Hp, Wp = nbh * S, nbw * S
            satL = pred_satd_z(planes_y, oy[:Hp, :Wp], mvL, refL, S,
                               Hp, Wp, qp, lam_me_f)
            satT = pred_satd_z(planes_y, oy[:Hp, :Wp], mvT, refT, S,
                               Hp, Wp, qp, lam_me_f)
            useT = satT < satL
            mvN = jnp.where(useT[..., None], mvT, mvL)
            refN = jnp.where(useT, refT, refL)
            midxN = jnp.where(
                useT,
                jnp.asarray(tabs["midx"][min(1, MM - 1)], jnp.float32),
                jnp.asarray(tabs["midx"][0], jnp.float32))
            if use_tmvp_dev:
                # TMVP arm: the scaled collocated MV (ref 0) — the
                # candidate HM's merge list always carries and the
                # spatial sweeps can never reach (xMergeEstimation's
                # temporal entry). Exact mv.py temporal_candidate /
                # scale_mv mirror so the adopted MV maps onto the
                # walk's merge index.
                ok0m, i0m, i1m = _col_geom(S, nbh, nbw)
                tdf = coltd_g.reshape(-1)
                mvf = colmv_g.reshape(-1, 2)
                td0 = jnp.where(jnp.asarray(ok0m).reshape(-1),
                                tdf[jnp.asarray(i0m)], 0)
                td1 = tdf[jnp.asarray(i1m)]
                use0 = td0 > 0
                td = jnp.where(use0, td0, td1)
                idx = jnp.where(use0, jnp.asarray(i0m), jnp.asarray(i1m))
                mvc = mvf[idx]
                tx_ = (16384 + (td >> 1)) // jnp.maximum(td, 1)
                dsf = jnp.clip((tx_ + 32) >> 6, -4096, 4095)
                p = dsf[:, None] * mvc
                sc = (jnp.sign(p) * ((jnp.abs(p) + 127) >> 8))
                sc = jnp.clip(sc, -32768, 32767)
                mvC = jnp.where((td == 1)[:, None], mvc, sc) \
                    .reshape(nbh, nbw, 2).astype(jnp.int32)
                refC = jnp.zeros((nbh, nbw), jnp.int32)
                okc = (td > 0).reshape(nbh, nbw)
                satC = pred_satd_z(planes_y, oy[:Hp, :Wp], mvC, refC, S,
                                   Hp, Wp, qp, lam_me_f)
                satC = jnp.where(okc, satC, jnp.float32(3e38))
                useC = satC < jnp.minimum(satL, satT)
                mvN = jnp.where(useC[..., None], mvC, mvN)
                refN = jnp.where(useC, refC, refN)
                midxN = jnp.where(
                    useC,
                    jnp.asarray(tabs["midx"][min(2, MM - 1)],
                                jnp.float32), midxN)
            mode_bN = (tabs["pred_inter"] + tabs["part2n"]
                       + tabs["mf1"] + midxN)
            ones = jnp.ones((nbh, nbw), bool)
            cm = code_candidate(mvN, refN, mode_bN, ones, midxN, S,
                                nbh, nbw)
            take = cm["cost"] < c["cost"]
            tp = up(take, S)
            tc = jnp.concatenate([up(take, S // 2)] * 2, axis=1)
            for k, m in (("lvl", tp), ("rec", tp), ("pred", tp),
                         ("lvl_c", tc), ("rec_c", tc), ("pred_c", tc)):
                c[k] = jnp.where(m, cm[k], c[k])
            for k in ("d", "bits", "cbf", "d0", "cost"):
                c[k] = jnp.where(take, cm[k], c[k])
            c["mv"] = jnp.where(take[..., None], cm["mv"], c["mv"])
            c["ref"] = jnp.where(take, cm["ref"], c["ref"])
            if "tsplit" in c:
                f = c["tsplit"].shape[0] // nbh
                c["tsplit"] = jnp.where(take.repeat(f, 0).repeat(f, 1),
                                        cm["tsplit"], c["tsplit"])
                t8 = up(take, S // 8)
                c["td8"] = jnp.where(t8, cm["td8"], c["td8"])
            return c

        sw16 = sw8 = sw32 = None
        if _TUNE.get("fuse_sweep", True):
            specs = [(16, nh16, nw16, mvq16.reshape(nh16, nw16, 2),
                      ref16.reshape(nh16, nw16))]
            if _TUNE["enable8"]:
                specs.append((8, nh8, nw8, mvq8.reshape(nh8, nw8, 2),
                              ref8.reshape(nh8, nw8)))
            if has32:
                specs.append((32, nh32, nw32,
                              mvq32.reshape(nh32, nw32, 2),
                              ref32.reshape(nh32, nw32)))
            settled_all = cand_sweep_all(tabs, qp, lam_me_f, oy,
                                         planes_y, specs)
            sw16 = settled_all[0]
            pos = 1
            if _TUNE["enable8"]:
                sw8 = settled_all[pos]
                pos += 1
            if has32:
                sw32 = settled_all[pos]

        c16 = run_class(mvq16, ref16, 16, nh16, nw16, settled=sw16)
        if has32:
            c32 = run_class(mvq32, ref32, 32, nh32, nw32, settled=sw32)

        # --- bottom-up quadtree compare ---------------------------------
        # 16 vs 4x8 (split flag of the 16 on the subs side)
        if _TUNE["enable8"]:
            c8 = run_class(mvq8, ref8, 8, nh8, nw8, settled=sw8)
            cost8q = c8["cost"].reshape(nh16, 2, nw16, 2).sum((1, 3)) \
                + lam * tabs["split"][1]
            use8 = cost8q < c16["cost"]
            best16 = jnp.minimum(c16["cost"], cost8q)
        else:
            use8 = jnp.zeros((nh16, nw16), bool)
            best16 = c16["cost"]

        # --- rectangular PU trials (2NxN / Nx2N) -------------------------
        # TEncCu::xCheckRDCostInter(SIZE_2NxN / SIZE_Nx2N) counterpart at
        # CU sizes 16 and 32: per-half motion candidates come from the
        # settled child class (S/2) grid, the cheaper-SATD shape is coded
        # exactly (per-half MC, TU = CU) and competes in the quadtree
        # compare. PU syntax is costed as AMVP (merge underestimated ->
        # partitions only win when clearly better; the native walk emits
        # real merges when they exist).
        def rect_trial(S, nbh_, nbw_, mv_c, ref_c, sq_mv):
            """Rect-PU candidate at CU size S from child-class (mv, ref)
            grids. Returns (cost, ptype(1=2NxN,2=Nx2N), per-8-cell mv,
            per-8-cell ref, coded planes dict)."""
            C = S // 2          # child CU size (the half-pick unit)
            f = C // 8          # 8-cells per child side
            HpS, WpS = nbh_ * S, nbw_ * S
            hc, wc = nbh_ * 2, nbw_ * 2      # child-grid dims
            oyS = oy[:HpS, :WpS]
            mv_cg = mv_c[:hc, :wc]
            ref_cg = ref_c[:hc, :wc]

            def half_pick(pair_axis):
                """Per-half best MV of the two member child cells
                (pair_axis 1: Sx(S/2) halves of 2NxN; 0: Nx2N)."""
                if pair_axis == 1:
                    first = jnp.repeat(mv_cg[:, 0::2], 2, 1)
                    second = jnp.repeat(mv_cg[:, 1::2], 2, 1)
                    rfirst = jnp.repeat(ref_cg[:, 0::2], 2, 1)
                    rsecond = jnp.repeat(ref_cg[:, 1::2], 2, 1)
                else:
                    first = jnp.repeat(mv_cg[0::2], 2, 0)
                    second = jnp.repeat(mv_cg[1::2], 2, 0)
                    rfirst = jnp.repeat(ref_cg[0::2], 2, 0)
                    rsecond = jnp.repeat(ref_cg[1::2], 2, 0)
                sat = []
                for mvm, refm in ((first, rfirst), (second, rsecond)):
                    p = pred_luma(planes_y,
                                  jnp.stack([up(mvm[..., 0], C),
                                             up(mvm[..., 1], C)], -1),
                                  up(refm, C), HpS, WpS)
                    s8 = satd8_plane(oyS - p)
                    sat.append(s8.reshape(hc, f, wc, f).sum((1, 3))
                               if f > 1 else s8)
                sA, sB = sat                       # per child cell
                if pair_axis == 1:
                    hA = sA[:, 0::2] + sA[:, 1::2]    # (hc, nbw_)
                    hB = sB[:, 0::2] + sB[:, 1::2]
                    takeB = hB < hA
                    tB2 = jnp.repeat(takeB, 2, 1)
                else:
                    hA = sA[0::2] + sA[1::2]          # (nbh_, wc)
                    hB = sB[0::2] + sB[1::2]
                    takeB = hB < hA
                    tB2 = jnp.repeat(takeB, 2, 0)
                mvh = jnp.where(tB2[..., None], second, first)
                refh = jnp.where(tB2, rsecond, rfirst)
                sath = jnp.where(takeB, hB, hA)
                return mvh, refh, sath

            mv_h, ref_h, sat_h = half_pick(1)   # 2NxN child maps
            mv_v, ref_v, sat_v = half_pick(0)   # Nx2N child maps
            s2nxn = sat_h[0::2] + sat_h[1::2]   # per-CU SATD (nbh_, nbw_)
            snx2n = sat_v[:, 0::2] + sat_v[:, 1::2]
            pick_v = snx2n < s2nxn
            ptype = jnp.where(pick_v, 2, 1)     # 1 = 2NxN, 2 = Nx2N
            pv2 = jnp.repeat(jnp.repeat(pick_v, 2, 0), 2, 1)
            mvpc = jnp.where(pv2[..., None], mv_v, mv_h)
            refpc = jnp.where(pv2, ref_v, ref_h)
            # per-8-cell maps for class_code + composition
            if f > 1:
                mv_cells = jnp.stack([up(mvpc[..., 0], f),
                                      up(mvpc[..., 1], f)], -1)
                ref_cells = up(refpc, f)
            else:
                mv_cells, ref_cells = mvpc, refpc
            cpart = class_code(qp, tabs, lam, oy, ouv, planes_y, pl_u,
                               pl_v, None, None, S, nbh_, nbw_,
                               mv_cells=mv_cells, ref_cells=ref_cells)
            mvd_lut = jnp.asarray(tabs["mvd_lut"])
            ref_lut = jnp.asarray(tabs["ref_bits"])
            sqmv2 = jnp.repeat(jnp.repeat(sq_mv, 2, 0), 2, 1)
            dmv = jnp.minimum(jnp.abs(mvpc - sqmv2), 4095)
            pu_bc = (mvd_lut[dmv[..., 0]] + mvd_lut[dmv[..., 1]]
                     + ref_lut[refpc] + tabs["mf0"] + tabs["mvp"])
            # each PU covers two child cells with identical bits -> 0.5x
            pu_bits = 0.5 * pu_bc.reshape(nbh_, 2, nbw_, 2).sum((1, 3))
            mode_bp = (tabs["pred_inter"] + pu_bits
                       + jnp.where(pick_v, jnp.asarray(tabs["part_hv"][1], jnp.float32),
                                   jnp.asarray(tabs["part_hv"][0], jnp.float32)))
            cbf_p = cpart["cbf"]
            syn_p = (tabs["skip0"] + mode_bp
                     + jnp.where(cbf_p, tabs["root1"], tabs["root0"]))
            bits_p = (syn_p + jnp.where(cbf_p, cpart["bits"], 0.0)
                      + tabs["split"][0])
            return cpart["d"] + lam * bits_p, ptype, mv_cells, ref_cells, \
                cpart

        use_part = None
        if use_parts:
            cost_p, ptype16, mvp8, refp8, cpart = rect_trial(
                16, nh16, nw16, c8["mv"], c8["ref"], c16["mv"])
            use_part = cost_p < best16
            best16 = jnp.minimum(best16, cost_p)
            use8 = use8 & ~use_part

        # intra-16 candidate competes at the 16 level (TEncCu.cpp:644)
        icand = None
        if _TUNE.get("intra", True):
            bm16, _ipy, _ipuv = intra16_class(qp, tabs, lam, lam_me_f,
                                              oy, ouv)
            ci16 = intra16_code(qp, tabs, lam, oy, ouv, _ipy, _ipuv)
            icost16 = intra16_cost(tabs, lam, ci16)
            icand = icost16 < best16
            best16 = jnp.minimum(best16, icost16)
        use32 = use64 = use_part32 = None
        if has32:
            b16 = best16[: nh32 * 2, : nw32 * 2].reshape(
                nh32, 2, nw32, 2).sum((1, 3)) + lam * tabs["split"][1]
            cand32 = c32["cost"]
            if use_parts:
                # rect PUs at the 32 level, halves from the settled 16s
                cost_p32, ptype32, mvp8_32, refp8_32, cpart32 = rect_trial(
                    32, nh32, nw32, c16["mv"], c16["ref"], c32["mv"])
                rect32_beats_sq = cost_p32 < cand32
                cand32 = jnp.minimum(cand32, cost_p32)
            use32any = cand32 < b16
            if use_parts:
                use_part32 = use32any & rect32_beats_sq
                use32 = use32any & ~rect32_beats_sq
            else:
                use32 = use32any
            best32 = jnp.minimum(cand32, b16)
            if has64 and _TUNE["enable64"]:
                # 64 CU: adopt the min-cost child 32's (mv, ref); residual
                # coded as 4x 32 TUs (forced RQT split at log2 64)
                sub_cost = c32["cost"][: nh64 * 2, : nw64 * 2].reshape(
                    nh64, 2, nw64, 2)
                flat = sub_cost.reshape(n64, 4)
                bi = jnp.argmin(flat, axis=1)
                sub_mv = c32["mv"][: nh64 * 2, : nw64 * 2].reshape(
                    nh64, 2, nw64, 2, 2).transpose(0, 2, 1, 3, 4).reshape(
                    n64, 4, 2)
                sub_ref = c32["ref"][: nh64 * 2, : nw64 * 2].reshape(
                    nh64, 2, nw64, 2).transpose(0, 2, 1, 3).reshape(n64, 4)
                mv64 = jnp.take_along_axis(
                    sub_mv, bi[:, None, None].repeat(2, 2), 1)[:, 0]
                ref64 = jnp.take_along_axis(sub_ref, bi[:, None], 1)[:, 0]
                c64 = run_class(mv64, ref64, 64, nh64, nw64)
                b32 = best32[: nh64 * 2, : nw64 * 2].reshape(
                    nh64, 2, nw64, 2).sum((1, 3)) + lam * tabs["split"][1]
                use64 = c64["cost"] < b32

        # --- compose final per-8-cell maps + planes ---------------------
        def cells(x, S):  # per-CU grid -> per-8-cell map
            return up(x, S // 8)

        def up_mv(mvg, S):
            return jnp.stack([up(mvg[..., 0], S // 8),
                              up(mvg[..., 1], S // 8)], -1)

        log2_map = jnp.where(cells(use8, 16), 3, 4).astype(jnp.int8)
        # per-8-cell "this CU's TUs split one level" (bool); composed in
        # lockstep with log2_map
        tsp_cells = jnp.zeros((h8, w8), jnp.int8)  # RQT depth per cell
        if use_tusplit:
            tsp_cells = tsp_cells.at[: nh16 * 2, : nw16 * 2].set(
                jnp.where(cells(use8, 16), 0, c16["td8"]))
        if _TUNE["enable8"]:
            mv_map = jnp.where(cells(use8, 16)[..., None], c8["mv"],
                               up_mv(c16["mv"], 16))
            ref_map = jnp.where(cells(use8, 16), c8["ref"],
                                cells(c16["ref"], 16))
        else:
            mv_map = up_mv(c16["mv"], 16)
            ref_map = cells(c16["ref"], 16)

        if _TUNE["enable8"]:
            m8pix = up(cells(use8, 16), 8)
            m8uv = jnp.concatenate([up(cells(use8, 16), 4)] * 2, axis=1)
            lvl_y = jnp.where(m8pix, c8["lvl"], c16["lvl"])
            rec_y = jnp.where(m8pix, c8["rec"], c16["rec"])
            lvl_uv = jnp.where(m8uv, c8["lvl_c"], c16["lvl_c"])
            rec_uv = jnp.where(m8uv, c8["rec_c"], c16["rec_c"])
        else:
            lvl_y, rec_y = c16["lvl"], c16["rec"]
            lvl_uv, rec_uv = c16["lvl_c"], c16["rec_c"]

        def paste(dst, src, m_pix, Hs, Ws):
            return dst.at[:Hs, :Ws].set(
                jnp.where(m_pix, src, dst[:Hs, :Ws]))

        def paste_uv(dst, src, m_pix, hs, ws):
            for off_d, off_s in ((0, 0), (Wc, src.shape[1] // 2)):
                dst = dst.at[:hs, off_d : off_d + ws].set(
                    jnp.where(m_pix, src[:, off_s : off_s + ws],
                              dst[:hs, off_d : off_d + ws]))
            return dst

        # rectangular-PU winners overwrite the 16/8 select; later 32/64
        # and intra pastes override them in turn (clearing part16_final)
        part16_final = None
        if use_parts:
            Hp16, Wp16 = nh16 * 16, nw16 * 16
            mp2 = jnp.repeat(jnp.repeat(use_part, 2, 0), 2, 1)
            mv_map = jnp.where(mp2[..., None], mvp8, mv_map)
            ref_map = jnp.where(mp2, refp8, ref_map)
            log2_map = jnp.where(mp2, jnp.int8(4), log2_map)
            if use_tusplit:
                tsp_cells = tsp_cells.at[: nh16 * 2, : nw16 * 2].set(
                    tsp_cells[: nh16 * 2, : nw16 * 2] & ~mp2)
            lvl_y = paste(lvl_y, cpart["lvl"], up(use_part, 16), Hp16,
                          Wp16)
            rec_y = paste(rec_y, cpart["rec"], up(use_part, 16), Hp16,
                          Wp16)
            mpart_c = up(use_part, 8)
            lvl_uv = paste_uv(lvl_uv, cpart["lvl_c"], mpart_c, Hp16 // 2,
                              Wp16 // 2)
            rec_uv = paste_uv(rec_uv, cpart["rec_c"], mpart_c, Hp16 // 2,
                              Wp16 // 2)
            part16_final = jnp.where(use_part, ptype16, 0)

        part32_final = None
        if has32:
            H32, W32 = nh32 * 32, nw32 * 32
            m32p = up(use32, 32)
            lvl_y = paste(lvl_y, c32["lvl"], m32p, H32, W32)
            rec_y = paste(rec_y, c32["rec"], m32p, H32, W32)
            m32c = up(use32, 16)
            lvl_uv = paste_uv(lvl_uv, c32["lvl_c"], m32c, H32 // 2,
                              W32 // 2)
            rec_uv = paste_uv(rec_uv, c32["rec_c"], m32c, H32 // 2,
                              W32 // 2)
            m32cell = up(use32, 4)
            log2_map = log2_map.at[: nh32 * 4, : nw32 * 4].set(
                jnp.where(m32cell, jnp.int8(5),
                          log2_map[: nh32 * 4, : nw32 * 4]))
            if use_tusplit:
                tsp_cells = tsp_cells.at[: nh32 * 4, : nw32 * 4].set(
                    jnp.where(m32cell, c32["td8"],
                              tsp_cells[: nh32 * 4, : nw32 * 4]))
            mv_map = mv_map.at[: nh32 * 4, : nw32 * 4].set(
                jnp.where(m32cell[..., None], up_mv(c32["mv"], 32),
                          mv_map[: nh32 * 4, : nw32 * 4]))
            ref_map = ref_map.at[: nh32 * 4, : nw32 * 4].set(
                jnp.where(m32cell, cells(c32["ref"], 32),
                          ref_map[: nh32 * 4, : nw32 * 4]))
            if use_part32 is not None:
                # rect-PU winners at the 32 level (TU = CU, no split)
                mp32 = up(use_part32, 32)
                lvl_y = paste(lvl_y, cpart32["lvl"], mp32, H32, W32)
                rec_y = paste(rec_y, cpart32["rec"], mp32, H32, W32)
                mp32c = up(use_part32, 16)
                lvl_uv = paste_uv(lvl_uv, cpart32["lvl_c"], mp32c,
                                  H32 // 2, W32 // 2)
                rec_uv = paste_uv(rec_uv, cpart32["rec_c"], mp32c,
                                  H32 // 2, W32 // 2)
                m32cp = up(use_part32, 4)
                log2_map = log2_map.at[: nh32 * 4, : nw32 * 4].set(
                    jnp.where(m32cp, jnp.int8(5),
                              log2_map[: nh32 * 4, : nw32 * 4]))
                if use_tusplit:
                    tsp_cells = tsp_cells.at[: nh32 * 4, : nw32 * 4].set(
                        jnp.where(m32cp, 0,
                                  tsp_cells[: nh32 * 4, : nw32 * 4]))
                mv_map = mv_map.at[: nh32 * 4, : nw32 * 4].set(
                    jnp.where(m32cp[..., None], mvp8_32,
                              mv_map[: nh32 * 4, : nw32 * 4]))
                ref_map = ref_map.at[: nh32 * 4, : nw32 * 4].set(
                    jnp.where(m32cp, refp8_32,
                              ref_map[: nh32 * 4, : nw32 * 4]))
                part32_final = jnp.where(use_part32, ptype32, 0)
            if part16_final is not None:
                cover32 = use32 if use_part32 is None else \
                    use32 | use_part32
                part16_final = part16_final.at[: nh32 * 2, : nw32 * 2].set(
                    jnp.where(jnp.repeat(jnp.repeat(cover32, 2, 0), 2, 1),
                              0, part16_final[: nh32 * 2, : nw32 * 2]))
            if has64 and use64 is not None:
                H64, W64 = nh64 * 64, nw64 * 64
                m64p = up(use64, 64)
                lvl_y = paste(lvl_y, c64["lvl"], m64p, H64, W64)
                rec_y = paste(rec_y, c64["rec"], m64p, H64, W64)
                m64c = up(use64, 32)
                lvl_uv = paste_uv(lvl_uv, c64["lvl_c"], m64c, H64 // 2,
                                  W64 // 2)
                rec_uv = paste_uv(rec_uv, c64["rec_c"], m64c, H64 // 2,
                                  W64 // 2)
                m64cell = up(use64, 8)
                log2_map = log2_map.at[: nh64 * 8, : nw64 * 8].set(
                    jnp.where(m64cell, jnp.int8(6),
                              log2_map[: nh64 * 8, : nw64 * 8]))
                if use_tusplit:
                    # c64["td8"]: per-8-cell RQT depth below the forced
                    # 32 TUs; absent when max_tu_depth_inter < 2
                    t64 = (c64["td8"] if "td8" in c64
                           else jnp.zeros((nh64 * 8, nw64 * 8), jnp.int8))
                    tsp_cells = tsp_cells.at[: nh64 * 8, : nw64 * 8].set(
                        jnp.where(m64cell, t64,
                                  tsp_cells[: nh64 * 8, : nw64 * 8]))
                mv_map = mv_map.at[: nh64 * 8, : nw64 * 8].set(
                    jnp.where(m64cell[..., None], up_mv(c64["mv"], 64),
                              mv_map[: nh64 * 8, : nw64 * 8]))
                ref_map = ref_map.at[: nh64 * 8, : nw64 * 8].set(
                    jnp.where(m64cell, cells(c64["ref"], 64),
                              ref_map[: nh64 * 8, : nw64 * 8]))
                if part16_final is not None:
                    part16_final = part16_final.at[
                        : nh64 * 4, : nw64 * 4].set(jnp.where(
                            jnp.repeat(jnp.repeat(use64, 4, 0), 4, 1),
                            0, part16_final[: nh64 * 4, : nw64 * 4]))
                if part32_final is not None:
                    part32_final = part32_final.at[
                        : nh64 * 2, : nw64 * 2].set(jnp.where(
                            jnp.repeat(jnp.repeat(use64, 2, 0), 2, 1),
                            0, part32_final[: nh64 * 2, : nw64 * 2]))

        # --- intra-16 exact reconstruction + composition -----------------
        intra_cells = jnp.zeros((h8, w8), bool)
        imode_map = jnp.zeros((nh16, nw16), jnp.int32)
        if icand is not None:
            kept = intra_suppress(icand)
            if has32 and use32 is not None:
                cov = jnp.zeros((nh16, nw16), bool)
                cov32 = use32 if use_part32 is None else \
                    use32 | use_part32
                cov = cov.at[: nh32 * 2, : nw32 * 2].set(
                    jnp.repeat(jnp.repeat(cov32, 2, 0), 2, 1))
                if has64 and use64 is not None:
                    cov = cov.at[: nh64 * 4, : nw64 * 4].set(
                        cov[: nh64 * 4, : nw64 * 4]
                        | jnp.repeat(jnp.repeat(use64, 4, 0), 4, 1))
                kept = kept & ~cov
            # exact prediction from the composed (pre-deblock) recon —
            # every reference sample of a kept cell is final inter recon
            t_x, l_x = cell_refs(rec_y, 16, 0, H, W)
            preds_x = intra_preds(t_x, l_x, 16, True)
            selm = bm16[:, None, None, None].repeat(16, 2).repeat(16, 3)
            pred_x = jnp.take_along_axis(preds_x, selm, 1)[:, 0]
            ipred_y = cells_to_plane(pred_x, 16, nh16, nw16)
            tu_x, lu_x = cell_refs(rec_uv, 8, 0, Hc, W)
            tv_x, lv_x = cell_refs(rec_uv, 8, Wc, Hc, W)
            selc = bm16[:, None, None, None].repeat(8, 2).repeat(8, 3)
            pu_x = jnp.take_along_axis(
                intra_preds(tu_x, lu_x, 8, False), selc, 1)[:, 0]
            pv_x = jnp.take_along_axis(
                intra_preds(tv_x, lv_x, 8, False), selc, 1)[:, 0]
            ipred_uv = jnp.concatenate(
                [cells_to_plane(pu_x, 8, nh16, nw16),
                 cells_to_plane(pv_x, 8, nh16, nw16)], axis=1)
            cix = intra16_code(qp, tabs, lam, oy, ouv, ipred_y, ipred_uv)
            kp_pix = up(kept, 16)
            Hp16, Wp16 = nh16 * 16, nw16 * 16
            lvl_y = paste(lvl_y, cix["lvl"], kp_pix, Hp16, Wp16)
            rec_y = paste(rec_y, cix["rec"], kp_pix, Hp16, Wp16)
            kp_c = up(kept, 8)
            lvl_uv = paste_uv(lvl_uv, cix["lvl_c"], kp_c, Hp16 // 2,
                              Wp16 // 2)
            rec_uv = paste_uv(rec_uv, cix["rec_c"], kp_c, Hp16 // 2,
                              Wp16 // 2)
            kp_cell = up(kept, 2)
            log2_map = log2_map.at[: nh16 * 2, : nw16 * 2].set(
                jnp.where(kp_cell, jnp.int8(4),
                          log2_map[: nh16 * 2, : nw16 * 2]))
            if use_tusplit:
                tsp_cells = tsp_cells.at[: nh16 * 2, : nw16 * 2].set(
                    tsp_cells[: nh16 * 2, : nw16 * 2] & ~kp_cell)
            mv_map = mv_map.at[: nh16 * 2, : nw16 * 2].set(
                jnp.where(kp_cell[..., None], 0,
                          mv_map[: nh16 * 2, : nw16 * 2]))
            intra_cells = intra_cells.at[: nh16 * 2, : nw16 * 2].set(
                kp_cell)
            imode_map = jnp.where(
                kept, jnp.asarray(IMODES)[bm16.reshape(nh16, nw16)], 0)
            if part16_final is not None:
                part16_final = jnp.where(kept, 0, part16_final)

        # per-8-cell cbf map from the composed level planes
        cbf_cells = (tile_sum((lvl_y != 0).astype(jnp.int32), 8)
                     + tile_sum((lvl_uv[:, :Wc] != 0).astype(jnp.int32), 4)
                     + tile_sum((lvl_uv[:, Wc:] != 0).astype(jnp.int32), 4)
                     ) > 0

        part_cells = None
        if part16_final is not None:
            # per-8-cell PU-origin partition map the syntax walk consumes
            # (pcode at the CU's origin cell; 16- and 32-level regions are
            # disjoint, so the two maps compose by nonzero-wins)
            pb = jnp.zeros((h8, w8), jnp.int32).at[
                : nh16 * 2, : nw16 * 2].set(
                jnp.repeat(jnp.repeat(part16_final, 2, 0), 2, 1))
            orig = jnp.asarray((np.arange(h8)[:, None] % 2 == 0)
                               & (np.arange(w8)[None] % 2 == 0))
            part_cells = jnp.where(orig, pb, 0)
            if part32_final is not None:
                pb32 = jnp.zeros((h8, w8), jnp.int32).at[
                    : nh32 * 4, : nw32 * 4].set(
                    jnp.repeat(jnp.repeat(part32_final, 4, 0), 4, 1))
                orig32 = jnp.asarray((np.arange(h8)[:, None] % 4 == 0)
                                     & (np.arange(w8)[None] % 4 == 0))
                pc32 = jnp.where(orig32, pb32, 0)
                part_cells = jnp.where(pc32 > 0, pc32, part_cells)

        if use_deblock:
            # luma-TB cbf only for the BS condition (§8.7.2.4)
            luma_cbf = tile_sum((lvl_y != 0).astype(jnp.int32), 8) > 0
            rec_y, rec_uv = deblock_device(
                rec_y, rec_uv, log2_map, mv_map, ref_map, luma_cbf, qp,
                intra_cells if icand is not None else None,
                tsp_cells if use_tusplit else None)
        sao_params = None
        if use_sao:
            rec_y, rec_uv, sao_params = sao_device(oy, ouv, rec_y, rec_uv,
                                                   lam, qp)

        ldt = jnp.int8 if lvl8 else jnp.int16
        parts = [u8(lvl_y.astype(ldt)), u8(lvl_uv.astype(ldt))]
        if fetch_recon:
            parts += [rec_y.astype(jnp.uint8).reshape(-1),
                      rec_uv.astype(jnp.uint8).reshape(-1)]
        else:
            xm = jnp.asarray(_xor_mask(H, W))
            xmc = jnp.asarray(_xor_mask(Hc, Wc))
            cks = jnp.stack([
                ((rec_y & 0xFF) ^ xm).sum().astype(jnp.int32),
                ((rec_uv[:, :Wc] & 0xFF) ^ xmc).sum().astype(jnp.int32),
                ((rec_uv[:, Wc:] & 0xFF) ^ xmc).sum().astype(jnp.int32)])
            sse3 = jnp.stack([
                ((oy - rec_y) ** 2).astype(jnp.float32).sum(),
                ((ouv[:, :Wc] - rec_uv[:, :Wc]) ** 2).astype(
                    jnp.float32).sum(),
                ((ouv[:, Wc:] - rec_uv[:, Wc:]) ** 2).astype(
                    jnp.float32).sum()])
            parts += [u8(cks), u8(sse3)]
        parts += [log2_map.astype(jnp.uint8).reshape(-1),
                  u8(mv_map.astype(jnp.int16)),
                  ref_map.astype(jnp.uint8).reshape(-1),
                  cbf_cells.astype(jnp.uint8).reshape(-1),
                  intra_cells.astype(jnp.uint8).reshape(-1),
                  imode_map.astype(jnp.uint8).reshape(-1),
                  (part_cells.astype(jnp.uint8).reshape(-1)
                   if part_cells is not None
                   else jnp.zeros(h8 * w8, jnp.uint8)),
                  tsp_cells.astype(jnp.uint8).reshape(-1)]
        if sao_params is not None:
            parts.append(u8(sao_params))
        parts += [u8(sad9_16.astype(jnp.int32)),
                  u8(mv16.astype(jnp.int16))]
        new_ry = jnp.concatenate([rec_y[None], ry_stack[:-1]])
        new_ruv = jnp.concatenate([rec_uv[None], ruv_stack[:-1]])
        # temporal seed for the next frame: the settled per-16 MVs
        # (post-sweep map, full-pel)
        seed16 = (mv_map[::2, ::2].reshape(n16, 2) // 4).astype(jnp.int32)
        # TMVP collocated motion for the next frame (== the host walk's
        # col maps built from the final FrameSyntax: decoder ColMotion)
        colmv_n = mv_map[::2, ::2].astype(jnp.int32)
        coltd_n = jnp.where(intra_cells[::2, ::2], 0,
                            ref_map[::2, ::2].astype(jnp.int32) + 1)
        return (new_ry, new_ruv, seed16, colmv_n, coltd_n), \
            jnp.concatenate(parts)

    # stage probes: tools/profile_grid.py times these closures standalone
    # (registering costs nothing — jit is lazy, nothing traces here)
    _PROBES.clear()
    _PROBES.update(dict(
        coarse_stack=coarse_stack, pick_coarse=pick_coarse, refine=refine,
        luma_planes_all=luma_planes_all, chroma_planes_all=chroma_planes_all,
        cand_sweep=cand_sweep, class_code=class_code, cu_cost=cu_cost,
        rdoq_plane=rdoq_plane, sbh_plane=sbh_plane, ideal_plane=ideal_plane,
        deblock_device=deblock_device, sao_device=sao_device,
        satd8_plane=satd8_plane, pred_satd_z=pred_satd_z,
        subpel_refine=subpel_refine, nn_refine=nn_refine,
        fwd_tx=fwd_tx, inv_tx=inv_tx, frame_step=frame_step,
        meta=dict(W=W, H=H, sr=sr, qps=qps, R=R, nc=nc, R2=R2,
                  tabs_by_qp=tabs_by_qp, HmL=HmL, WmL=WmL, HmC=HmC,
                  WmC=WmC, Hc=Hc, Wc=Wc, G=G),
    ))

    def gop_step(carry, xs, live=None):
        if use_wp:
            frames_g, navail_g, wpw_g, wpo_g, wpd_g = xs
        else:
            frames_g, navail_g = xs
        outs = []
        for g in range(G):
            wp_g = ((wpw_g[g], wpo_g[g], wpd_g[g]) if use_wp else None)
            carry, pk = frame_step(carry, frames_g[g], navail_g[g], g,
                                   wp=wp_g, live=live)
            outs.append(pk)
        return carry, jnp.stack(outs)

    hc16, wc16 = (h8 + 1) // 2, (w8 + 1) // 2

    def _carry0(ry_stack, ruv_stack):
        # chunk-initial carry: zero MV seed + all-invalid collocated
        # motion (exact for the first chunk, whose col pic is the IDR;
        # later chunks lose one frame of device-side TMVP candidates —
        # the host walk always uses the true col maps)
        return (ry_stack, ruv_stack, jnp.zeros((n16, 2), jnp.int32),
                jnp.zeros((hc16, wc16, 2), jnp.int32),
                jnp.zeros((hc16, wc16), jnp.int32))

    if use_wp:
        def run(frames_u8, navail, wpw, wpo, wpd, ry_stack, ruv_stack,
                live=None):
            (ry_stack, ruv_stack, *_), packed = jax.lax.scan(
                lambda c, x: gop_step(c, x, live),
                _carry0(ry_stack, ruv_stack),
                (frames_u8, navail, wpw, wpo, wpd))
            return packed.reshape(n_gops * G, -1), ry_stack, ruv_stack

        fn = jax.jit(run, donate_argnums=(5, 6))
    else:
        def run(frames_u8, navail, ry_stack, ruv_stack, live=None):
            (ry_stack, ruv_stack, *_), packed = jax.lax.scan(
                lambda c, x: gop_step(c, x, live),
                _carry0(ry_stack, ruv_stack), (frames_u8, navail))
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
    h8, w8 = H // 8, W // 8
    nh16, nw16 = H // 16, W // 16
    n16 = nh16 * nw16
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
        log2_map=take(h8 * w8, np.uint8, (h8, w8)).astype(np.int32),
        mv_map=take(h8 * w8 * 4, np.int16, (h8, w8, 2)).astype(np.int32),
        ref_map=take(h8 * w8, np.uint8, (h8, w8)).astype(np.int32),
        cbf_map=take(h8 * w8, np.uint8, (h8, w8)).astype(np.int32),
        intra_map=take(h8 * w8, np.uint8, (h8, w8)).astype(np.int32),
        imode_map=take(n16, np.uint8, (nh16, nw16)).astype(np.int32),
        part_map=take(h8 * w8, np.uint8, (h8, w8)),
        tsplit_map=take(h8 * w8, np.uint8, (h8, w8)).astype(np.int32),
    )
    if sps.sao_enabled:
        ctu = 1 << sps.log2_ctu
        ny = (H + ctu - 1) // ctu
        nx = (W + ctu - 1) // ctu
        n = ny * nx
        d.update(
            sao_ty=take(n, np.int8, (ny, nx)).astype(np.int32),
            sao_ay=take(n, np.int8, (ny, nx)).astype(np.int32),
            sao_oy=take(n * 4, np.int8, (ny, nx, 4)).astype(np.int32),
            sao_tc=take(n, np.int8, (ny, nx)).astype(np.int32),
            sao_acb=take(n, np.int8, (ny, nx)).astype(np.int32),
            sao_ocb=take(n * 4, np.int8, (ny, nx, 4)).astype(np.int32),
            sao_acr=take(n, np.int8, (ny, nx)).astype(np.int32),
            sao_ocr=take(n * 4, np.int8, (ny, nx, 4)).astype(np.int32),
        )
    d.update(
        sad9_16=take(n16 * 36, np.int32, (n16, 9)),
        mv16=take(n16 * 4, np.int16, (n16, 2)).astype(np.int32),
    )
    return d


def assemble_grid_frame(cfg, buf: np.ndarray, num_ref: int = 1,
                        col=None):
    """Fetched frame row -> (FrameSyntax, recon[, stats]) via the native
    decision walk; returns None when the native library is unavailable
    (callers fall back to collect_grid_frame + assemble_frame_p).
    col: TMVP collocated motion (col_mv16, col_td16) of the previous
    coded picture — required when sps.temporal_mvp_enabled (the python
    fallback walk has no TMVP, so a missing native col walk is a hard
    error rather than a silently wrong stream)."""
    from ..entropy.native import decision_walk_map_native
    from ..entropy.syntax import FrameSyntax

    sps = cfg.sps
    W, H = sps.coded_width, sps.coded_height
    Hc, Wc = H // 2, W // 2
    d = _parse_frame_buf(cfg, buf)
    # intra cells ride the walk as ref sentinel 255 (unavailable as
    # motion neighbors, no merge/AMVP derivation of their own)
    ref_in = d["ref_map"]
    has_intra = bool(d["intra_map"].any())
    if has_intra:
        ref_in = np.where(d["intra_map"] > 0, 255, ref_in)
    part_map = d.get("part_map")
    has_parts = part_map is not None and bool(part_map.any())
    if sps.temporal_mvp_enabled and col is None:
        raise RuntimeError("temporal_mvp_enabled needs the collocated "
                           "motion maps at assembly")
    maps = decision_walk_map_native(
        d["log2_map"], d["mv_map"], ref_in, d["cbf_map"],
        W, H, sps.log2_ctu, cfg.max_num_merge_cand, num_ref,
        part_map=part_map if has_parts else None,
        col=col if sps.temporal_mvp_enabled else None)
    if maps is None:
        if sps.temporal_mvp_enabled:
            raise RuntimeError("temporal_mvp_enabled needs the native "
                               "col decision walk")
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
    if has_parts:
        fs.part_mode = part_map.astype(np.int32)
    tsp = d.get("tsplit_map")
    if tsp is not None and bool(tsp.any()):
        # leaf TU log2 per 4-cell: min(CU, 32) minus the one-level RQT
        # split chosen on device; drives split_transform_flag in the
        # writers (syntax._enc_transform_tree_p / native transform_tree_p)
        tu8 = np.minimum(d["log2_map"], 5) - tsp
        fs.tu_log2 = np.repeat(np.repeat(tu8, 2, 0), 2, 1).astype(
            fs.tu_log2.dtype)
    if has_intra:
        im = d["intra_map"] > 0
        fs.inter_dir = np.where(im, 0, fs.inter_dir)
        fs.skip = np.where(im, 0, fs.skip)
        fs.merge_flag = np.where(im, 0, fs.merge_flag)
        fs.ref_idx = np.where(im, 0, fs.ref_idx)
        modes16 = d["imode_map"]
        m8 = np.repeat(np.repeat(modes16, 2, 0), 2, 1)[: im.shape[0],
                                                       : im.shape[1]]
        fs.luma_mode = np.where(im, m8, fs.luma_mode)
        fs.chroma_mode = np.where(im, 4, fs.chroma_mode)  # DM
        m4 = np.repeat(np.repeat(m8, 2, 0), 2, 1)
        im4 = np.repeat(np.repeat(im, 2, 0), 2, 1)
        fs.luma_mode4 = np.where(im4, m4, fs.luma_mode4).astype(
            fs.luma_mode4.dtype)
        fs.tu_log2 = np.where(im4, 4, fs.tu_log2).astype(
            fs.tu_log2.dtype)
        fs.full_features = True  # 16x16 intra-in-P routes to recon_full
    if "sao_ty" in d:
        from .sao_enc import SaoPicParams

        ny, nx = d["sao_ty"].shape
        fs.sao = SaoPicParams(
            ny, nx, type_y=d["sao_ty"], aux_y=d["sao_ay"],
            off_y=d["sao_oy"], type_c=d["sao_tc"], aux_cb=d["sao_acb"],
            off_cb=d["sao_ocb"], aux_cr=d["sao_acr"], off_cr=d["sao_ocr"])
        fs.sao = _sao_thrift(fs.sao)
    if "rec_y" in d:
        rec = (d["rec_y"].astype(np.int32),
               np.ascontiguousarray(d["rec_uv"][:, :Wc]).astype(np.int32),
               np.ascontiguousarray(d["rec_uv"][:, Wc:]).astype(np.int32))
        return fs, rec
    hashes = [int(np.uint32(c)).to_bytes(4, "big") for c in d["cks"]]
    return fs, None, dict(hashes=hashes, hash_type=2, sse=d["sse"])


def _sao_thrift(pp):
    """Bit-only SAO cleanup on the device decisions (apply unchanged):
    merge-left/up when a neighbor's effective params are identical
    (HM's dominant merge case: long OFF runs at high QP cost one flag
    per CTU instead of re-coded types), and slice-level disable of a
    component whose every CTU is OFF (sao_luma/chroma_flag = 0,
    TEncSampleAdaptiveOffset's picture-level decision)."""
    from .sao_enc import SAO_OFF

    same_y = np.zeros((pp.ny, pp.nx, 2), bool)
    same_c = np.zeros((pp.ny, pp.nx, 2), bool)

    def eq(a, y, x, sy, sx):
        return bool(np.array_equal(a[y, x], a[sy, sx]))

    for y in range(pp.ny):
        for x in range(pp.nx):
            for k, (sy, sx) in enumerate(((y, x - 1), (y - 1, x))):
                if sx < 0 or sy < 0:
                    continue
                same_y[y, x, k] = (eq(pp.type_y, y, x, sy, sx)
                                   and eq(pp.aux_y, y, x, sy, sx)
                                   and eq(pp.off_y, y, x, sy, sx))
                same_c[y, x, k] = (eq(pp.type_c, y, x, sy, sx)
                                   and eq(pp.aux_cb, y, x, sy, sx)
                                   and eq(pp.off_cb, y, x, sy, sx)
                                   and eq(pp.aux_cr, y, x, sy, sx)
                                   and eq(pp.off_cr, y, x, sy, sx))
            both = same_y[y, x] & same_c[y, x]
            if both[0]:
                pp.merge[y, x] = 1
            elif both[1]:
                pp.merge[y, x] = 2
    pp.luma_on = bool((pp.type_y != SAO_OFF).any())
    pp.chroma_on = bool((pp.type_c != SAO_OFF).any())
    if not pp.luma_on and not pp.chroma_on:
        return None  # slice flags 0: no per-CTU SAO syntax at all
    return pp


def collect_grid_frame(cfg, buf: np.ndarray):
    """One fetched frame row -> per_cu dict compatible with
    inter_enc.assemble_frame_p (python-walk fallback path)."""
    sps = cfg.sps
    W, H = sps.coded_width, sps.coded_height
    Hc, Wc = H // 2, W // 2
    d = _parse_frame_buf(cfg, buf)
    if "rec_y" not in d:
        raise RuntimeError("python-walk fallback requires fetch_recon")
    if d.get("part_map") is not None and d["part_map"].any():
        raise RuntimeError("python-walk fallback cannot serialize "
                           "rectangular partitions (native walk v3 only)")
    if d.get("tsplit_map") is not None and d["tsplit_map"].any():
        raise RuntimeError("python-walk fallback cannot serialize "
                           "TU splits (FrameSyntax tu_log2 path only)")
    lvl_y, rec_y = d["lvl_y"], d["rec_y"]
    lvl_u, lvl_v = d["lvl_uv"][:, :Wc], d["lvl_uv"][:, Wc:]
    rec_u, rec_v = d["rec_uv"][:, :Wc], d["rec_uv"][:, Wc:]
    log2_map = d["log2_map"]
    h8, w8 = log2_map.shape
    per_cu = {}
    seen = np.zeros((h8, w8), bool)
    for y8 in range(h8):
        for x8 in range(w8):
            if seen[y8, x8]:
                continue
            lg = int(log2_map[y8, x8])
            size = 1 << lg
            s8 = size // 8
            seen[y8 : y8 + s8, x8 : x8 + s8] = True
            x0, y0 = x8 * 8, y8 * 8
            cs = size // 2
            cx, cy = x0 // 2, y0 // 2
            per_cu[(x0, y0)] = dict(
                size=size, mv=d["mv_map"][y8, x8],
                ref=int(d["ref_map"][y8, x8]),
                lvl=lvl_y[y0 : y0 + size, x0 : x0 + size],
                rec=rec_y[y0 : y0 + size, x0 : x0 + size].astype(np.int32),
                lvl_u=lvl_u[cy : cy + cs, cx : cx + cs],
                rec_u=rec_u[cy : cy + cs, cx : cx + cs].astype(np.int32),
                lvl_v=lvl_v[cy : cy + cs, cx : cx + cs],
                rec_v=rec_v[cy : cy + cs, cx : cx + cs].astype(np.int32),
            )
            if d["intra_map"][y8, x8]:
                per_cu[(x0, y0)]["intra_mode"] = int(
                    d["imode_map"][y8 // 2, x8 // 2])
    return per_cu
