"""Intra prediction: reference assembly, smoothing, and the 35 HEVC modes.

Counterpart of the reference's TComPrediction (xPredIntraPlanar/Ang/DC,
TComPrediction.cpp:229-830) and TComPattern::fillReferenceSamples
(TComPattern.cpp:51) — SURVEY.md §2.1. Restructured TPU-first: a batched
kernel computes predictions for N blocks at once (optionally all 35 modes at
once for the SATD prescreen, cf. estIntraPredLumaQT SURVEY.md §A.3).

Reference sample layout used throughout: for an S x S TB,
  side[i], i in [0, 2S]  : p[-1][-1] at i=0, then top row p[0..2S-1][-1]
  left[i], i in [0, 2S]  : p[-1][-1] at i=0, then left col p[-1][0..2S-1]
(both include the corner at index 0, simplifying the angular main-ref build).
All samples are post-substitution (always "available").
"""

from __future__ import annotations

import numpy as np

from ..utils.tables import (
    DC_IDX,
    HOR_IDX,
    INTRA_INV_ANGLE,
    INTRA_PRED_ANGLE,
    PLANAR_IDX,
    VER_IDX,
)

# smoothing threshold per nTbS (§8.4.4.2.3): index by log2 size
_FILTER_THRES = {3: 7, 4: 1, 5: 0}


def mode_angle(mode: int) -> int:
    return int(INTRA_PRED_ANGLE[mode - 2])


def mode_inv_angle(mode: int) -> int:
    return int(INTRA_INV_ANGLE[mode - 11])


def filter_flag(mode: int, log2_size: int) -> bool:
    """Whether [1 2 1] reference smoothing applies (luma only)."""
    if mode == DC_IDX or log2_size == 2:
        return False
    min_dist = min(abs(mode - HOR_IDX), abs(mode - VER_IDX))
    if mode == PLANAR_IDX:
        min_dist = 10  # |planar-10| per mode-number arithmetic
    return min_dist > _FILTER_THRES[log2_size]


def smooth_refs_np(top: np.ndarray, left: np.ndarray, bit_depth: int = 8,
                   strong: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """[1 2 1]/4 smoothing of the reference arrays (§8.4.4.2.3).
    top/left: (..., 2S+1) with corner at index 0 (shared)."""
    s2 = top.shape[-1] - 1  # 2S
    if strong:
        # bi-linear strong smoothing for 32x32 (§8.4.4.2.3 eq. 8-30..8-35)
        size = s2 // 2
        tl = top[..., 0]
        tr = top[..., s2]
        bl = left[..., s2]
        i = np.arange(1, s2)
        ft = top.copy()
        fl = left.copy()
        # pF at array index i = ((2N-i)*TL + i*TR + N) >> (log2(2N)); the
        # reference writes ((uiTuWidth2-i)*topLeft + i*topRight +
        # uiTuWidth) >> shift (TComPattern.cpp:279)
        ft[..., 1:s2] = ((s2 - i) * tl[..., None] + i * tr[..., None] + 32) >> 6
        fl[..., 1:s2] = ((s2 - i) * tl[..., None] + i * bl[..., None] + 32) >> 6
        return ft, fl
    ft = top.copy()
    fl = left.copy()
    # corner filtered with top[1] and left[1]
    ft[..., 0] = (left[..., 1] + 2 * top[..., 0] + top[..., 1] + 2) >> 2
    fl[..., 0] = ft[..., 0]
    ft[..., 1:s2] = (top[..., :s2 - 1] + 2 * top[..., 1:s2] + top[..., 2:] + 2) >> 2
    fl[..., 1:s2] = (left[..., :s2 - 1] + 2 * left[..., 1:s2] + left[..., 2:] + 2) >> 2
    # last samples unfiltered (p[2S-1])
    return ft, fl


def strong_smoothing_ok(top: np.ndarray, left: np.ndarray, bit_depth: int = 8) -> np.ndarray:
    """Flatness criterion enabling bilinear smoothing for 32x32 luma."""
    s2 = top.shape[-1] - 1
    size = s2 // 2
    thr = 1 << (bit_depth - 5)
    c1 = np.abs(top[..., 0] + top[..., s2] - 2 * top[..., size]) < thr
    c2 = np.abs(left[..., 0] + left[..., s2] - 2 * left[..., size]) < thr
    return c1 & c2


def predict_np(top: np.ndarray, left: np.ndarray, mode: int, size: int,
               bit_depth: int = 8) -> np.ndarray:
    """Single-block prediction. top/left: (2S+1,) arrays (corner at 0).
    Returns (S, S) prediction [y][x]. No post-filtering toggles here:
    DC/H/V boundary filters are applied by the caller for luma < 32."""
    s = size
    maxv = (1 << bit_depth) - 1
    t = top.astype(np.int32)
    l = left.astype(np.int32)
    if mode == PLANAR_IDX:
        x = np.arange(s)[None, :]
        y = np.arange(s)[:, None]
        tr = t[s + 1]  # p[nTbS][-1]
        bl = l[s + 1]  # p[-1][nTbS]
        pred = (
            (s - 1 - x) * l[1 + np.arange(s)][:, None]
            + (x + 1) * tr
            + (s - 1 - y) * t[1 + np.arange(s)][None, :]
            + (y + 1) * bl
            + s
        ) >> (int(s).bit_length())  # log2(s) + 1
        return pred.astype(np.int32)
    if mode == DC_IDX:
        dc = (t[1 : s + 1].sum() + l[1 : s + 1].sum() + s) >> (int(s).bit_length())
        return np.full((s, s), dc, dtype=np.int32)
    angle = mode_angle(mode)
    if mode >= 18:
        # vertical-ish: main reference = top row
        ref = np.zeros(3 * s + 2, dtype=np.int32)  # index i maps x = i - s
        ref[s : 3 * s + 1] = t[: 2 * s + 1]
        ref[3 * s + 1] = t[2 * s]
        if angle < 0:
            inv = mode_inv_angle(mode)
            need = (s * angle) >> 5
            if need < -1:  # extension only when reads reach below ref[0]
                for x in range(-1, need - 1, -1):
                    ref[s + x] = l[((x * inv + 128) >> 8)]
        y = np.arange(1, s + 1)[:, None]
        pos = y * angle
        idx = (pos >> 5) + np.arange(s)[None, :]  # x offset
        frac = pos & 31
        a = ref[s + idx + 1]   # ref[x + iIdx + 1], corner at ref[s]
        b = ref[s + idx + 2]
        pred = ((32 - frac) * a + frac * b + 16) >> 5
        return pred.astype(np.int32)
    # horizontal-ish: main reference = left col, then transpose
    ref = np.zeros(3 * s + 2, dtype=np.int32)
    ref[s : 3 * s + 1] = l[: 2 * s + 1]
    ref[3 * s + 1] = l[2 * s]
    if angle < 0:
        inv = mode_inv_angle(mode)
        need = (s * angle) >> 5
        if need < -1:
            for x in range(-1, need - 1, -1):
                ref[s + x] = t[((x * inv + 128) >> 8)]
    y = np.arange(1, s + 1)[:, None]
    pos = y * angle
    idx = (pos >> 5) + np.arange(s)[None, :]
    frac = pos & 31
    a = ref[s + idx + 1]
    b = ref[s + idx + 2]
    pred = ((32 - frac) * a + frac * b + 16) >> 5
    return pred.T.astype(np.int32)


def post_filter_np(pred: np.ndarray, top: np.ndarray, left: np.ndarray,
                   mode: int, bit_depth: int = 8) -> np.ndarray:
    """DC/H/V boundary filtering for luma TBs < 32 (§8.4.4.2.5/2.6)."""
    s = pred.shape[-1]
    maxv = (1 << bit_depth) - 1
    p = pred.copy()
    t = top.astype(np.int32)
    l = left.astype(np.int32)
    if mode == DC_IDX:
        dc = p[0, 0]
        p[0, 1:] = (t[2 : s + 1] + 3 * dc + 2) >> 2
        p[1:, 0] = (l[2 : s + 1] + 3 * dc + 2) >> 2
        p[0, 0] = (l[1] + 2 * dc + t[1] + 2) >> 2
    elif mode == VER_IDX:
        p[:, 0] = np.clip(t[1] + ((l[1 : s + 1] - l[0]) >> 1), 0, maxv)
    elif mode == HOR_IDX:
        p[0, :] = np.clip(l[1] + ((t[1 : s + 1] - t[0]) >> 1), 0, maxv)
    return p


def predict_block_np(top: np.ndarray, left: np.ndarray, mode: int, size: int,
                     is_luma: bool, bit_depth: int = 8,
                     strong_smoothing: bool = True) -> np.ndarray:
    """Full per-TB intra prediction incl. smoothing + post filters."""
    log2 = int(size).bit_length() - 1
    ft, fl = top, left
    if is_luma and filter_flag(mode, log2):
        strong = (
            log2 == 5 and strong_smoothing
            and bool(strong_smoothing_ok(top, left, bit_depth))
        )
        ft, fl = smooth_refs_np(top, left, bit_depth, strong=strong)
    pred = predict_np(ft, fl, mode, size, bit_depth)
    if is_luma and size < 32:
        pred = post_filter_np(pred, top, left, mode, bit_depth)
    return pred


# --- JAX batched variant ---------------------------------------------------

def predict_all_modes(top, left, size: int, is_luma: bool = True,
                      bit_depth: int = 8, strong_smoothing: bool = True):
    """JAX: (N, 2S+1) refs -> (N, 35, S, S) predictions for every mode.

    Used by the batched SATD prescreen (phase-A mode decision). Builds both
    the filtered and unfiltered reference banks once, then evaluates the
    modes with static python loop (35 fixed iterations, unrolled in trace).
    """
    import jax.numpy as jnp

    s = size
    log2 = int(s).bit_length() - 1
    n = top.shape[0]
    t = top.astype(jnp.int32)
    l = left.astype(jnp.int32)

    if is_luma and log2 >= 3:
        ftop, fleft = _smooth_refs_jnp(t, l)
        if log2 == 5 and strong_smoothing:
            ok = _strong_ok_jnp(t, l, bit_depth)[:, None]
            st, sl = _strong_refs_jnp(t, l)
            ftop = jnp.where(ok, st, ftop)
            fleft = jnp.where(ok, sl, fleft)
    else:
        ftop, fleft = t, l

    preds = []
    for mode in range(35):
        use_f = is_luma and filter_flag(mode, log2)
        tt = ftop if use_f else t
        ll = fleft if use_f else l
        p = _predict_one_jnp(tt, ll, mode, s)
        if is_luma and s < 32:
            p = _post_filter_jnp(p, t, l, mode, bit_depth)
        preds.append(p)
    return jnp.stack(preds, axis=1)


def _smooth_refs_jnp(t, l):
    import jax.numpy as jnp

    s2 = t.shape[-1] - 1
    corner = (l[:, 1] + 2 * t[:, 0] + t[:, 1] + 2) >> 2
    ft_mid = (t[:, : s2 - 1] + 2 * t[:, 1:s2] + t[:, 2:] + 2) >> 2
    fl_mid = (l[:, : s2 - 1] + 2 * l[:, 1:s2] + l[:, 2:] + 2) >> 2
    ft = jnp.concatenate([corner[:, None], ft_mid, t[:, s2:]], axis=-1)
    fl = jnp.concatenate([corner[:, None], fl_mid, l[:, s2:]], axis=-1)
    return ft, fl


def _strong_refs_jnp(t, l):
    import jax.numpy as jnp

    s2 = t.shape[-1] - 1
    i = jnp.arange(1, s2)
    tl = t[:, 0:1]
    tr = t[:, s2 : s2 + 1]
    bl = l[:, s2 : s2 + 1]
    ft_mid = ((s2 - i) * tl + i * tr + 32) >> 6
    fl_mid = ((s2 - i) * tl + i * bl + 32) >> 6
    ft = jnp.concatenate([tl, ft_mid, tr], axis=-1)
    fl = jnp.concatenate([tl, fl_mid, bl], axis=-1)
    return ft, fl


def _strong_ok_jnp(t, l, bit_depth):
    import jax.numpy as jnp

    s2 = t.shape[-1] - 1
    size = s2 // 2
    thr = 1 << (bit_depth - 5)
    c1 = jnp.abs(t[:, 0] + t[:, s2] - 2 * t[:, size]) < thr
    c2 = jnp.abs(l[:, 0] + l[:, s2] - 2 * l[:, size]) < thr
    return c1 & c2


def _predict_one_jnp(t, l, mode: int, s: int):
    """(N, 2S+1) refs -> (N, S, S) for one (static) mode."""
    import jax.numpy as jnp

    n = t.shape[0]
    if mode == PLANAR_IDX:
        x = jnp.arange(s)[None, None, :]
        y = jnp.arange(s)[None, :, None]
        tr = t[:, s + 1][:, None, None]
        bl = l[:, s + 1][:, None, None]
        lcol = l[:, 1 : s + 1][:, :, None]
        trow = t[:, 1 : s + 1][:, None, :]
        shift = int(s).bit_length()  # log2(s) + 1
        return (
            (s - 1 - x) * lcol + (x + 1) * tr
            + (s - 1 - y) * trow + (y + 1) * bl + s
        ) >> shift
    if mode == DC_IDX:
        dc = (
            t[:, 1 : s + 1].sum(-1) + l[:, 1 : s + 1].sum(-1) + s
        ) >> int(s).bit_length()
        return jnp.broadcast_to(dc[:, None, None], (n, s, s))
    angle = mode_angle(mode)
    main, side = (t, l) if mode >= 18 else (l, t)
    # extended reference: indices -s..2s relative to block start
    need = (s * angle) >> 5 if angle < 0 else 0
    if angle < 0 and need < -1:
        inv = mode_inv_angle(mode)
        # projected side samples for x in [need, -1]
        proj_idx = [((x * inv + 128) >> 8) for x in range(need, 0)]
        proj = side[:, jnp.asarray(proj_idx, dtype=jnp.int32)]
        ref = jnp.concatenate([proj, main[:, : 2 * s + 1]], axis=-1)
        base = -need  # ref[base + i] == main-line sample at offset i
    else:
        ref = main[:, : 2 * s + 1]
        base = 0
    y = np.arange(1, s + 1)[:, None]
    pos = y * angle
    idx = (pos >> 5) + np.arange(s)[None, :] + 1  # +1 skips corner
    frac = pos & 31
    idx_a = jnp.asarray(base + idx, dtype=jnp.int32).reshape(-1)
    a = ref[:, idx_a].reshape(n, s, s)
    b = ref[:, idx_a + 1].reshape(n, s, s)
    frac_j = jnp.asarray(frac, dtype=jnp.int32)[None]
    pred = ((32 - frac_j) * a + frac_j * b + 16) >> 5
    if mode < 18:
        pred = jnp.swapaxes(pred, -1, -2)
    return pred


def _post_filter_jnp(pred, t, l, mode: int, bit_depth: int):
    import jax.numpy as jnp

    s = pred.shape[-1]
    maxv = (1 << bit_depth) - 1
    if mode == DC_IDX:
        dc = pred[:, 0, 0][:, None]
        row0 = (t[:, 2 : s + 1] + 3 * dc + 2) >> 2
        col0 = (l[:, 2 : s + 1] + 3 * dc + 2) >> 2
        corner = (l[:, 1] + 2 * dc[:, 0] + t[:, 1] + 2) >> 2
        row = jnp.concatenate([corner[:, None], row0], axis=-1)
        pred = pred.at[:, 0, :].set(row)
        pred = pred.at[:, 1:, 0].set(col0)
        return pred
    if mode == VER_IDX:
        col = jnp.clip(
            t[:, 1][:, None] + ((l[:, 1 : s + 1] - l[:, 0][:, None]) >> 1), 0, maxv
        )
        return pred.at[:, :, 0].set(col)
    if mode == HOR_IDX:
        row = jnp.clip(
            l[:, 1][:, None] + ((t[:, 1 : s + 1] - t[:, 0][:, None]) >> 1), 0, maxv
        )
        return pred.at[:, 0, :].set(row)
    return pred


# --- batched numpy predictor bank (host decision passes) -------------------
# Same math as the jnp versions above, without the jax runtime cold-start;
# used by the open-loop quadtree intra decision (codec/intra_qt.py).

def _predict_one_npb(t, l, mode: int, s: int):
    n = t.shape[0]
    if mode == PLANAR_IDX:
        x = np.arange(s)[None, None, :]
        y = np.arange(s)[None, :, None]
        tr = t[:, s + 1][:, None, None]
        bl = l[:, s + 1][:, None, None]
        lcol = l[:, 1 : s + 1][:, :, None]
        trow = t[:, 1 : s + 1][:, None, :]
        shift = int(s).bit_length()
        return (
            (s - 1 - x) * lcol + (x + 1) * tr
            + (s - 1 - y) * trow + (y + 1) * bl + s
        ) >> shift
    if mode == DC_IDX:
        dc = (
            t[:, 1 : s + 1].sum(-1) + l[:, 1 : s + 1].sum(-1) + s
        ) >> int(s).bit_length()
        return np.broadcast_to(dc[:, None, None], (n, s, s)).copy()
    angle = mode_angle(mode)
    main, side = (t, l) if mode >= 18 else (l, t)
    need = (s * angle) >> 5 if angle < 0 else 0
    if angle < 0 and need < -1:
        inv = mode_inv_angle(mode)
        proj_idx = [((x * inv + 128) >> 8) for x in range(need, 0)]
        proj = side[:, np.asarray(proj_idx, dtype=np.int32)]
        ref = np.concatenate([proj, main[:, : 2 * s + 1]], axis=-1)
        base = -need
    else:
        ref = main[:, : 2 * s + 1]
        base = 0
    y = np.arange(1, s + 1)[:, None]
    pos = y * angle
    idx = (pos >> 5) + np.arange(s)[None, :] + 1
    frac = pos & 31
    idx_a = (base + idx).astype(np.int32).reshape(-1)
    a = ref[:, idx_a].reshape(n, s, s)
    # when frac == 0 the b term is weighted 0; clamp the gather (the jnp
    # twin relies on XLA's clamped out-of-bounds gather for the same case)
    b = ref[:, np.minimum(idx_a + 1, ref.shape[1] - 1)].reshape(n, s, s)
    fr = frac.astype(np.int32)[None]
    pred = ((32 - fr) * a + fr * b + 16) >> 5
    if mode < 18:
        pred = np.swapaxes(pred, -1, -2)
    return pred


def predict_all_modes_np(top, left, size: int, is_luma: bool = True,
                         bit_depth: int = 8, strong_smoothing: bool = True):
    """numpy twin of predict_all_modes: (N, 2S+1) refs -> (N, 35, S, S)."""
    s = size
    log2 = int(s).bit_length() - 1
    t = top.astype(np.int32)
    l = left.astype(np.int32)
    maxv = (1 << bit_depth) - 1

    if is_luma and log2 >= 3:
        s2 = t.shape[-1] - 1
        corner = (l[:, 1] + 2 * t[:, 0] + t[:, 1] + 2) >> 2
        ft = np.concatenate(
            [corner[:, None],
             (t[:, : s2 - 1] + 2 * t[:, 1:s2] + t[:, 2:] + 2) >> 2,
             t[:, s2:]], axis=-1)
        fl = np.concatenate(
            [corner[:, None],
             (l[:, : s2 - 1] + 2 * l[:, 1:s2] + l[:, 2:] + 2) >> 2,
             l[:, s2:]], axis=-1)
        if log2 == 5 and strong_smoothing:
            thr = 1 << (bit_depth - 5)
            ok = ((np.abs(t[:, 0] + t[:, s2] - 2 * t[:, s2 // 2]) < thr)
                  & (np.abs(l[:, 0] + l[:, s2] - 2 * l[:, s2 // 2]) < thr)
                  )[:, None]
            i = np.arange(1, s2)
            tl_, tr_, bl_ = t[:, 0:1], t[:, s2 : s2 + 1], l[:, s2 : s2 + 1]
            st = np.concatenate(
                [tl_, ((s2 - i) * tl_ + i * tr_ + 32) >> 6, tr_], -1)
            sl = np.concatenate(
                [tl_, ((s2 - i) * tl_ + i * bl_ + 32) >> 6, bl_], -1)
            ft = np.where(ok, st, ft)
            fl = np.where(ok, sl, fl)
    else:
        ft, fl = t, l

    out = np.empty((t.shape[0], 35, s, s), dtype=np.int32)
    for mode in range(35):
        use_f = is_luma and filter_flag(mode, log2)
        tt = ft if use_f else t
        ll = fl if use_f else l
        p = _predict_one_npb(tt, ll, mode, s)
        if is_luma and s < 32:
            if mode == DC_IDX:
                dc = p[:, 0, 0][:, None]
                p = p.copy()
                p[:, 0, 1:] = (t[:, 2 : s + 1] + 3 * dc + 2) >> 2
                p[:, 1:, 0] = (l[:, 2 : s + 1] + 3 * dc + 2) >> 2
                p[:, 0, 0] = (l[:, 1] + 2 * dc[:, 0] + t[:, 1] + 2) >> 2
            elif mode == VER_IDX:
                p = p.copy()
                p[:, :, 0] = np.clip(
                    t[:, 1][:, None]
                    + ((l[:, 1 : s + 1] - l[:, 0][:, None]) >> 1), 0, maxv)
            elif mode == HOR_IDX:
                p = p.copy()
                p[:, 0, :] = np.clip(
                    l[:, 1][:, None]
                    + ((t[:, 1 : s + 1] - t[:, 0][:, None]) >> 1), 0, maxv)
        out[:, mode] = p
    return out
