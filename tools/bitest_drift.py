#!/usr/bin/env python
"""Quantify the init-state bit estimator's drift vs the adaptive coder.

The RD decisions in the device path cost residuals with
entropy/bitest.ResidualBitEst, whose CABAC context states are frozen at
slice-init values (a deliberate trade for batchability — HM's
FAST_BIT_EST estBitsSbac tables are likewise refreshed only per CTU,
TComTrQuant.cpp:208). This tool measures the resulting estimate drift
against the exact adaptive counting coder across (QP, TU size, content
density) cells and writes the table to results/bitest_drift.json, so
the approximation's error is a recorded number instead of a vibe.

Run: python tools/bitest_drift.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpuhevc.entropy.bitest import FracBits, ResidualBitEst  # noqa: E402
from tpuhevc.entropy.cabac import CabacBitEstimator, ContextSet  # noqa: E402
from tpuhevc.entropy.residual import encode_residual  # noqa: E402
from tpuhevc.ops import transforms as tx  # noqa: E402
from tpuhevc.utils.tables import SCAN_DIAG  # noqa: E402


def tiles_for(S, qp, kind, seed, n=96):
    rng = np.random.default_rng(seed)
    if kind == "skipheavy":  # mostly-zero: the adaptation-sensitive case
        res = rng.normal(0, 1.2, (n, S, S))
        res[: n // 8] += rng.normal(0, 10, (n // 8, S, S))
    elif kind == "inter":
        res = rng.normal(0, 4, (n, S, S))
        res[: n // 4] += rng.normal(0, 14, (n // 4, S, S))
    else:  # intra-like dense
        res = rng.normal(0, 18, (n, S, S))
    res = np.clip(np.round(res), -255, 255).astype(np.int32)
    coef = tx.forward_transform_np(res, 8)
    return tx.quantize_np(coef, qp, S.bit_length() - 1, 8, False)


def real_bits(tiles, log2, qp):
    """Per-tile adaptive-coder bits, plus the context snapshot at the
    halfway point (the chunk-feedback boundary the adaptive estimator
    re-freezes at)."""
    ctx = ContextSet(1, qp)
    enc = CabacBitEstimator(ctx)
    per = []
    mid_states = None
    half = len(tiles) // 2
    for i, t in enumerate(tiles):
        if i == half:
            mid_states = list(ctx.states)
        b0 = enc.frac_bits
        if t.any():
            encode_residual(enc, t, log2, True, SCAN_DIAG)
        per.append((enc.frac_bits - b0) / 32768.0)
    return np.asarray(per), mid_states, half


def main():
    rows = []
    for qp in (22, 27, 32, 37):
        fb = FracBits(1, qp)
        for S in (8, 16, 32):
            est = ResidualBitEst(fb, S.bit_length() - 1, True)
            for kind in ("skipheavy", "inter", "intra"):
                t = tiles_for(S, qp, kind, seed=qp * S + hash(kind) % 97)
                nz = t.reshape(len(t), -1).any(1)
                if nz.sum() < 4:
                    continue
                got = np.asarray(est.tu_bits(np, t), float)
                real, mid_states, half = real_bits(t, S.bit_length() - 1,
                                                   qp)
                m = nz  # only coded TUs drift
                ratio = float(got[m].sum() / max(real[m].sum(), 1e-9))
                perr = np.abs(got[m] - real[m]) / np.maximum(real[m], 1.0)
                # adaptive re-freeze (grid_live_tables counterpart):
                # tables from the first half's END states, evaluated on
                # the SECOND half only — past data predicting future
                # bits, exactly the chunk-feedback situation
                fb2 = FracBits.from_states(1, qp, mid_states)
                est2 = ResidualBitEst(fb2, S.bit_length() - 1, True)
                m2 = nz.copy()
                m2[:half] = False
                got2 = np.asarray(est2.tu_bits(np, t), float)
                ratio2 = float(got2[m2].sum()
                               / max(real[m2].sum(), 1e-9)) \
                    if m2.sum() >= 2 else None
                rows.append(dict(
                    qp=qp, S=S, kind=kind, n_coded=int(m.sum()),
                    bits_real=round(float(real[m].sum()), 1),
                    bits_est=round(float(got[m].sum()), 1),
                    agg_ratio=round(ratio, 4),
                    agg_ratio_refrozen=(round(ratio2, 4)
                                        if ratio2 is not None else None),
                    per_tu_mean_abs_rel=round(float(perr.mean()), 4),
                    per_tu_p90_abs_rel=round(float(
                        np.percentile(perr, 90)), 4),
                ))
    worst = max(rows, key=lambda r: abs(r["agg_ratio"] - 1))
    worst2 = max((r for r in rows if r["agg_ratio_refrozen"] is not None),
                 key=lambda r: abs(r["agg_ratio_refrozen"] - 1))
    out = dict(rows=rows, worst_cell=worst, worst_cell_refrozen=worst2,
               note="agg_ratio = est/real total bits over coded TUs "
                    "(warmed-init frozen tables); agg_ratio_refrozen = "
                    "tables re-frozen at the halfway context snapshot "
                    "evaluated on the second half only — the adaptive "
                    "chunk-feedback estimator the encoder now runs")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "bitest_drift.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(dict(cells=len(rows), worst=worst), indent=1))


if __name__ == "__main__":
    main()
