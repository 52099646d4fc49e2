"""DCT-IF sub-pel interpolation + motion-compensated prediction, batched.

Counterpart of TComInterpolationFilter.{h,cpp} (8-tap luma / 4-tap chroma
separable filters, TComInterpolationFilter.cpp:57-76) and the MC fractional
sample process of H.265 §8.5.3.3.3. TPU-first: one batched kernel computes
N PU predictions at once; per-PU filter taps are gathered by fractional
phase so mixed phases stay in a single dispatch. Out-of-picture reads use
coordinate clamping (the spec's normative edge padding).

Uniform two-pass formulation: both passes always run; integer phases use
the identity tap [.., 64, ..] so every case lands at the 14-bit
intermediate scale, and the final stage is clip((acc + 32) >> 6) (8-bit).
"""

from __future__ import annotations

import numpy as np

# H.265 Table 8-12: luma taps per quarter-pel phase (identity at 0)
LUMA_TAPS = np.array(
    [
        [0, 0, 0, 64, 0, 0, 0, 0],
        [-1, 4, -10, 58, 17, -5, 1, 0],
        [-1, 4, -11, 40, 40, -11, 4, -1],
        [0, 1, -5, 17, 58, -10, 4, -1],
    ],
    dtype=np.int32,
)

# H.265 Table 8-13: chroma taps per eighth-pel phase
CHROMA_TAPS = np.array(
    [
        [0, 64, 0, 0],
        [-2, 58, 10, -2],
        [-4, 54, 16, -2],
        [-6, 46, 28, -4],
        [-4, 36, 36, -4],
        [-4, 28, 46, -6],
        [-2, 16, 54, -4],
        [-2, 10, 58, -2],
    ],
    dtype=np.int32,
)


def _gather_windows_np(plane, x0s, y0s, win):
    h, w = plane.shape
    n = len(x0s)
    out = np.empty((n, win, win), dtype=np.int32)
    ys = np.clip(y0s[:, None] + np.arange(win)[None, :], 0, h - 1)
    xs = np.clip(x0s[:, None] + np.arange(win)[None, :], 0, w - 1)
    for i in range(n):
        out[i] = plane[np.ix_(ys[i], xs[i])]
    return out


def mc_np(plane: np.ndarray, xs, ys, mvs_q: np.ndarray, size: int,
          is_luma: bool, bit_depth: int = 8) -> np.ndarray:
    """Reference MC: (N,) block positions + (N, 2) MVs -> (N, S, S) pred.
    Luma MVs in quarter-pel, chroma MVs in eighth-pel of the chroma grid."""
    taps_tab = LUMA_TAPS if is_luma else CHROMA_TAPS
    ntaps = taps_tab.shape[1]
    off = 3 if is_luma else 1
    fmask = 3 if is_luma else 7
    fshift = 2 if is_luma else 3
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    mvs = np.asarray(mvs_q)
    ix = xs + (mvs[:, 0] >> fshift)
    iy = ys + (mvs[:, 1] >> fshift)
    fx = mvs[:, 0] & fmask
    fy = mvs[:, 1] & fmask
    win = size + ntaps - 1
    w = _gather_windows_np(plane, ix - off, iy - off, win).astype(np.int64)
    th = taps_tab[fx].astype(np.int64)  # (N, ntaps)
    tv = taps_tab[fy].astype(np.int64)
    # horizontal pass, truncated to the 14-bit intermediate scale
    # (shift1 = bd - 8, §8.5.3.3.3 / TComInterpolationFilter shifts)
    acc_h = np.zeros((len(xs), win, size), dtype=np.int64)
    for i in range(ntaps):
        acc_h += th[:, i, None, None] * w[:, :, i : i + size]
    acc_h >>= bit_depth - 8
    acc = np.zeros((len(xs), size, size), dtype=np.int64)
    for i in range(ntaps):
        acc += tv[:, i, None, None] * acc_h[:, i : i + size, :]
    acc >>= 6
    sh2 = 14 - bit_depth
    maxv = (1 << bit_depth) - 1
    return np.clip((acc + (1 << (sh2 - 1))) >> sh2, 0, maxv
                   ).astype(np.int32)


def mc_np14(plane: np.ndarray, xs, ys, mvs_q: np.ndarray, size: int,
            is_luma: bool, bit_depth: int = 8) -> np.ndarray:
    """MC at the 14-bit intermediate scale (§8.5.3.3.3: isLast=false),
    for bi-prediction averaging. Returns (N, S, S) int32 (14-bit range)."""
    taps_tab = LUMA_TAPS if is_luma else CHROMA_TAPS
    ntaps = taps_tab.shape[1]
    off = 3 if is_luma else 1
    fmask = 3 if is_luma else 7
    fshift = 2 if is_luma else 3
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    mvs = np.asarray(mvs_q)
    ix = xs + (mvs[:, 0] >> fshift)
    iy = ys + (mvs[:, 1] >> fshift)
    fx = mvs[:, 0] & fmask
    fy = mvs[:, 1] & fmask
    win = size + ntaps - 1
    w = _gather_windows_np(plane, ix - off, iy - off, win).astype(np.int64)
    th = taps_tab[fx].astype(np.int64)
    tv = taps_tab[fy].astype(np.int64)
    acc_h = np.zeros((len(xs), win, size), dtype=np.int64)
    for i in range(ntaps):
        acc_h += th[:, i, None, None] * w[:, :, i : i + size]
    acc_h >>= bit_depth - 8
    acc = np.zeros((len(xs), size, size), dtype=np.int64)
    for i in range(ntaps):
        acc += tv[:, i, None, None] * acc_h[:, i : i + size, :]
    return (acc >> 6).astype(np.int32)  # 14-bit scale


def bi_average_np(p0_14: np.ndarray, p1_14: np.ndarray,
                  bit_depth: int = 8) -> np.ndarray:
    """Default bi-prediction combine (§8.5.3.3.3.2): shift2 = 15 - bd."""
    shift = 15 - bit_depth
    off = 1 << (shift - 1)
    maxv = (1 << bit_depth) - 1
    return np.clip((p0_14.astype(np.int64) + p1_14 + off) >> shift,
                   0, maxv).astype(np.int32)


def uni_from14_np(p14: np.ndarray, bit_depth: int = 8) -> np.ndarray:
    shift = 14 - bit_depth
    off = 1 << (shift - 1)
    maxv = (1 << bit_depth) - 1
    return np.clip((p14.astype(np.int64) + off) >> shift, 0, maxv
                   ).astype(np.int32)


def mc(plane, xs, ys, mvs_q, size: int, is_luma: bool, bit_depth: int = 8):
    """JAX batched MC, semantics identical to mc_np."""
    import jax.numpy as jnp

    taps_tab = jnp.asarray(LUMA_TAPS if is_luma else CHROMA_TAPS)
    ntaps = taps_tab.shape[1]
    off = 3 if is_luma else 1
    fmask = 3 if is_luma else 7
    fshift = 2 if is_luma else 3
    h, w = plane.shape
    ix = xs + (mvs_q[:, 0] >> fshift)
    iy = ys + (mvs_q[:, 1] >> fshift)
    fx = mvs_q[:, 0] & fmask
    fy = mvs_q[:, 1] & fmask
    win = size + ntaps - 1
    ycoord = jnp.clip(iy[:, None] - off + jnp.arange(win)[None, :], 0, h - 1)
    xcoord = jnp.clip(ix[:, None] - off + jnp.arange(win)[None, :], 0, w - 1)
    wnd = plane[ycoord[:, :, None], xcoord[:, None, :]].astype(jnp.int32)
    th = taps_tab[fx]  # (N, ntaps)
    tv = taps_tab[fy]
    hs = jnp.stack([wnd[:, :, i : i + size] for i in range(ntaps)], axis=-1)
    acc_h = jnp.einsum("nrci,ni->nrc", hs, th) >> (bit_depth - 8)
    vs = jnp.stack([acc_h[:, i : i + size, :] for i in range(ntaps)], axis=-1)
    acc = jnp.einsum("nrci,ni->nrc", vs, tv) >> 6
    sh2 = 14 - bit_depth
    maxv = (1 << bit_depth) - 1
    return jnp.clip((acc + (1 << (sh2 - 1))) >> sh2, 0, maxv
                    ).astype(jnp.int32)


def mc14(plane, xs, ys, mvs_q, size: int, is_luma: bool,
         bit_depth: int = 8):
    """JAX batched MC at the 14-bit intermediate scale (mc_np14 twin) —
    the bi-prediction input (§8.5.3.3.3.2)."""
    import jax.numpy as jnp

    taps_tab = jnp.asarray(LUMA_TAPS if is_luma else CHROMA_TAPS)
    ntaps = taps_tab.shape[1]
    off = 3 if is_luma else 1
    fmask = 3 if is_luma else 7
    fshift = 2 if is_luma else 3
    h, w = plane.shape
    ix = xs + (mvs_q[:, 0] >> fshift)
    iy = ys + (mvs_q[:, 1] >> fshift)
    fx = mvs_q[:, 0] & fmask
    fy = mvs_q[:, 1] & fmask
    win = size + ntaps - 1
    ycoord = jnp.clip(iy[:, None] - off + jnp.arange(win)[None, :], 0,
                      h - 1)
    xcoord = jnp.clip(ix[:, None] - off + jnp.arange(win)[None, :], 0,
                      w - 1)
    wnd = plane[ycoord[:, :, None], xcoord[:, None, :]].astype(jnp.int32)
    th = taps_tab[fx]
    tv = taps_tab[fy]
    hs = jnp.stack([wnd[:, :, i : i + size] for i in range(ntaps)],
                   axis=-1)
    acc_h = jnp.einsum("nrci,ni->nrc", hs, th) >> (bit_depth - 8)
    vs = jnp.stack([acc_h[:, i : i + size, :] for i in range(ntaps)],
                   axis=-1)
    return jnp.einsum("nrci,ni->nrc", vs, tv) >> 6


def bi_average(p0_14, p1_14, bit_depth: int = 8):
    """JAX bi_average_np twin: (a + b + off) >> shift, clipped."""
    import jax.numpy as jnp

    shift = 15 - bit_depth
    offs = 1 << (shift - 1)
    maxv = (1 << bit_depth) - 1
    return jnp.clip((p0_14 + p1_14 + offs) >> shift, 0,
                    maxv).astype(jnp.int32)
