"""Source preanalysis for adaptive QP.

Counterpart of the reference's TEncPreanalyzer (TEncPreanalyzer.cpp:63
xPreanalyze) + the per-CU QP offset of TEncSlice.cpp:917: per-AQ-unit
activity is 1 + min(variance of the four quadrants), and the QP offset is

    normAct = (maxQScale * act + avg) / (act + maxQScale * avg)
    offset  = floor(6 * log2(normAct) + 0.49999),  maxQScale = 2^(range/6)

Used with AdaptiveQP (depth 0: AQ unit = CTU) — the offsets ride the
cu_qp_delta syntax like CTU-level rate control does.
"""

from __future__ import annotations

import math

import numpy as np


def ctu_activity(y: np.ndarray, ctu: int = 64) -> np.ndarray:
    """Per-CTU activity: 1 + min variance over the CTU's four quadrants
    (TEncPreanalyzer::xPreanalyze)."""
    h, w = y.shape
    hctu = -(-h // ctu)
    wctu = -(-w // ctu)
    y = np.asarray(y, np.float64)
    act = np.empty((hctu, wctu), np.float64)
    for cy in range(hctu):
        for cx in range(wctu):
            blk = y[cy * ctu : (cy + 1) * ctu, cx * ctu : (cx + 1) * ctu]
            bh, bw = blk.shape
            hh, hw = bh >> 1, bw >> 1
            if hh == 0 or hw == 0:
                act[cy, cx] = 1.0
                continue
            quads = (blk[:hh, :hw], blk[:hh, hw:bw], blk[hh:bh, :hw],
                     blk[hh:bh, hw:bw])
            act[cy, cx] = 1.0 + min(float(q.var()) for q in quads)
    return act


def adaptive_qp_map(y: np.ndarray, base_qp: int, ctu: int = 64,
                    qp_range: int = 6) -> np.ndarray:
    """Per-CTU QpY map from spatial activity (TEncSlice.cpp:911-922)."""
    act = ctu_activity(y, ctu)
    avg = float(act.mean())
    s = 2.0 ** (qp_range / 6.0)
    out = np.empty(act.shape, np.int32)
    for cy in range(act.shape[0]):
        for cx in range(act.shape[1]):
            norm = (s * act[cy, cx] + avg) / (act[cy, cx] + s * avg)
            off = math.floor(6.0 * math.log2(norm) + 0.49999)
            out[cy, cx] = min(max(base_qp + off, 0), 51)
    return out
