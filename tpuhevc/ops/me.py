"""Batched integer-pel motion estimation + the NN-FME SAD surface.

TPU-first replacement for the reference's sequential TZ search
(TEncSearch::xTZSearch, TEncSearch.cpp:4737): every PU of a frame evaluates
a dense (2R+1)^2 SAD map in one batched dispatch (fixed point budget, no
data-dependent control flow), instead of diamond/raster/star stages. The
best offset is argmin(SAD + lambda-weighted MV bits); the 3x3 raw-SAD
neighborhood around the winner — the NN-FME input the reference collects
via its save-flagged square search (TEncSearch.cpp:1168,5037) — falls out
of the dense map for free.

argmin is restricted to the interior of the map so the 3x3 surface always
exists (the reference instead leaves its array short at borders — a
documented quirk, SURVEY.md §A.4.2/6).
"""

from __future__ import annotations

import numpy as np


def mv_bits_table(sr: int) -> np.ndarray:
    """(2R+1, 2R+1) Exp-Golomb-ish bit cost of each full-pel offset vs a
    zero predictor (quarter-pel mvd => |v*4|), mirroring TComRdCost's
    getCostOfVectorWithPredictor bit model."""
    d = np.arange(-sr, sr + 1)
    bits1 = 2 * np.ceil(np.log2(2 * np.abs(4 * d) + 1)).astype(np.int64) + 1
    return bits1[:, None] + bits1[None, :]


def _windows_np(plane, xs, ys, size, sr):
    h, w = plane.shape
    win = size + 2 * sr
    n = len(xs)
    out = np.empty((n, win, win), dtype=np.int32)
    for i in range(n):
        yy = np.clip(ys[i] - sr + np.arange(win), 0, h - 1)
        xx = np.clip(xs[i] - sr + np.arange(win), 0, w - 1)
        out[i] = plane[np.ix_(yy, xx)]
    return out


def integer_me_np(ref, cur, xs, ys, sr, lambda_fp256: int):
    """ref (H,W), cur (N,S,S), positions (N,). Returns
    (mv_full (N,2), sad_map (N, 2R+1, 2R+1), best_idx (N,2))."""
    n, s, _ = cur.shape
    wnd = _windows_np(ref, xs, ys, s, sr)
    m = 2 * sr + 1
    sad = np.empty((n, m, m), dtype=np.int64)
    c = cur.astype(np.int32)
    for dy in range(m):
        for dx in range(m):
            sad[:, dy, dx] = (
                np.abs(wnd[:, dy : dy + s, dx : dx + s] - c).sum(axis=(1, 2))
            )
    cost = sad + (mv_bits_table(sr)[None] * lambda_fp256 >> 8)
    # interior-only argmin so the 3x3 neighborhood exists
    inner = cost[:, 1 : m - 1, 1 : m - 1].reshape(n, -1)
    bi = np.argmin(inner, axis=1)
    by = bi // (m - 2) + 1
    bx = bi % (m - 2) + 1
    mv = np.stack([bx - sr, by - sr], axis=-1).astype(np.int32)
    return mv, sad, np.stack([bx, by], axis=-1)


def sad_surface_np(sad_map, best_idx):
    """(N, 9) [TL,T,TR,L,C,R,BL,B,BR] raw SADs around the winner."""
    n = sad_map.shape[0]
    out = np.empty((n, 9), dtype=np.int64)
    k = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out[:, k] = sad_map[np.arange(n), best_idx[:, 1] + dy,
                                best_idx[:, 0] + dx]
            k += 1
    return out


def fracdif_refine_np(ref, cur, xs, ys, mv_int, lambda_fp256: int = 0,
                      bit_depth: int = 8):
    """DCT-IF fractional refinement (xPatternSearchFracDIF,
    TEncSearch.cpp:5232): 9-point half-pel SATD search around the integer
    MV, then 9-point quarter-pel around the best half-pel. This is the
    standard search the reference computes (and NN-FME replaces); it is
    both the 'dctif' A/B arm and the ground-truth labeler for NN-FME
    training (TEncSearch.cpp:4561-4582).

    cur: (N, S, S); mv_int: (N, 2) full-pel. Returns (N, 2) quarter-pel.
    """
    from .cost import satd_np
    from .interp import mc_np

    n, s, _ = cur.shape
    # HM s_acMvRefineH/Q visit order (ties resolve to earlier entries)
    offs = np.array([(0, 0), (0, -1), (0, 1), (-1, 0), (1, 0),
                     (-1, -1), (1, -1), (-1, 1), (1, 1)], np.int32)
    sub = max(1, s // 8)  # SATD over 8x8 subblocks (4x4 for tiny PUs)
    bs = 8 if s >= 8 else 4

    def satd_pu(pred):
        a = cur.reshape(n, s // bs, bs, s // bs, bs).transpose(0, 1, 3, 2, 4)
        b = pred.reshape(n, s // bs, bs, s // bs, bs).transpose(0, 1, 3, 2, 4)
        return satd_np(a, b).reshape(n, -1).sum(axis=1)

    mvq = mv_int.astype(np.int32) * 4
    for step in (2, 1):
        costs = np.empty((9, n), np.int64)
        for k, (dx, dy) in enumerate(offs):
            cand = mvq + np.array([dx * step, dy * step], np.int32)
            pred = mc_np(ref, xs, ys, cand, s, True, bit_depth)
            bits = (_mv_bits(cand[:, 0]) + _mv_bits(cand[:, 1]))
            costs[k] = satd_pu(pred) + ((bits * lambda_fp256) >> 8)
        best = np.argmin(costs, axis=0)
        mvq = mvq + offs[best] * step
    return mvq


def _mv_bits(v):
    return (2 * np.ceil(np.log2(2 * np.abs(v).astype(np.int64) + 1))
            .astype(np.int64) + 1)


def integer_me(ref, cur, xs, ys, sr: int, lambda_fp256: int):
    """JAX batched dense-SAD search; returns (mv_full (N,2), sad9 (N,9))."""
    import jax
    import jax.numpy as jnp

    n, s, _ = cur.shape
    h, w = ref.shape
    m = 2 * sr + 1
    win = s + 2 * sr
    ycoord = jnp.clip(ys[:, None] - sr + jnp.arange(win)[None], 0, h - 1)
    xcoord = jnp.clip(xs[:, None] - sr + jnp.arange(win)[None], 0, w - 1)
    wnd = ref[ycoord[:, :, None], xcoord[:, None, :]].astype(jnp.int32)
    c = cur.astype(jnp.int32)

    def row(dy):
        rows = jax.lax.dynamic_slice_in_dim(wnd, dy, s, axis=1)  # (N,S,win)
        slices = jnp.stack(
            [rows[:, :, dx : dx + s] for dx in range(m)], axis=1
        )  # (N, m, S, S)
        return jnp.abs(slices - c[:, None]).sum(axis=(-1, -2))  # (N, m)

    sad = jax.lax.map(row, jnp.arange(m)).transpose(1, 0, 2)  # (N, m, m)
    bits = jnp.asarray(mv_bits_table(sr), dtype=jnp.int32)
    cost = sad + ((bits[None] * lambda_fp256) >> 8)
    inner = cost[:, 1 : m - 1, 1 : m - 1].reshape(n, -1)
    bi = jnp.argmin(inner, axis=1)
    by = bi // (m - 2) + 1
    bx = bi % (m - 2) + 1
    mv = jnp.stack([bx - sr, by - sr], axis=-1).astype(jnp.int32)
    idx = jnp.arange(n)
    sad9 = jnp.stack(
        [sad[idx, by + dy, bx + dx] for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
        axis=-1,
    )
    return mv, sad9
