"""Distortion kernels: SAD / SSE / Hadamard SATD, batched.

Counterpart of the reference's TComRdCost function-pointer table
(TComRdCost.cpp:120-163, xCalcHADs8x8 at 1330) — SURVEY.md §2.1. Sum of
absolute Hadamard-transformed differences is invariant to the butterfly's
output ordering, so a plain H*D*H^T with a natural-order Hadamard matrix
matches HM's 3-stage butterflies.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=None)
def hadamard(n: int) -> np.ndarray:
    if n == 1:
        return np.array([[1]], dtype=np.int32)
    h = hadamard(n // 2)
    return np.block([[h, h], [h, -h]]).astype(np.int32)


def sad_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.abs(a.astype(np.int32) - b.astype(np.int32)).sum(axis=(-1, -2))


def sse_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    d = a.astype(np.int64) - b.astype(np.int64)
    return (d * d).sum(axis=(-1, -2))


def satd_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """HM-style Hadamard SATD for 4x4 or 8x8 blocks (batched: (..., S, S))."""
    s = a.shape[-1]
    h = hadamard(s)
    d = a.astype(np.int32) - b.astype(np.int32)
    m = h @ d @ h.T
    tot = np.abs(m).sum(axis=(-1, -2))
    if s == 8:
        return (tot + 2) >> 2
    if s == 4:
        return (tot + 1) >> 1
    return tot >> (s.bit_length() - 1)


def satd(a, b):
    """JAX batched SATD (..., S, S) -> (...)."""
    import jax.numpy as jnp

    s = a.shape[-1]
    h = jnp.asarray(hadamard(s))
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    m = h @ d @ h.T
    tot = jnp.abs(m).sum(axis=(-1, -2))
    if s == 8:
        return (tot + 2) >> 2
    if s == 4:
        return (tot + 1) >> 1
    return tot >> (int(s).bit_length() - 1)


def sad(a, b):
    import jax.numpy as jnp

    return jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32)).sum(axis=(-1, -2))


def sse(a, b):
    import jax.numpy as jnp

    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    return (d * d).sum(axis=(-1, -2))
