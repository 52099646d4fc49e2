"""General-stream reconstruction: decodes pictures using the full parsed
feature set (TU quadtree below the CU, NxN intra PUs, 64 intra CUs,
transform skip) rather than this encoder's TU = CU subset.

Counterpart of the reference's TDecCu::xReconIntraQT (TDecCu.cpp:417,657)
walking the recorded fs.tu_log2 / fs.luma_mode4 maps in decode order.
Availability is evaluated at 4x4 luma granularity (the spec's minimum
block grid), so TBs inside a CU see earlier TBs' reconstruction.
"""

from __future__ import annotations

import numpy as np

from ..ops import transforms as tx
from ..ops.intra import predict_block_np
from ..utils.tables import chroma_qp, intra_scan_idx  # noqa: F401
from .refsamples import BlockOrder, gather_refs_qt


def _inv_ts(d: np.ndarray, bd: int) -> np.ndarray:
    """Transform-skip inverse (§8.6.4.2): r = (d << 7 + rnd) >> bdShift."""
    bdshift = 20 - bd
    return ((d.astype(np.int64) << 7) + (1 << (bdshift - 1))) >> bdshift


def _recon_tb(plane, coeff_pl, x0, y0, size, mode, order, qp, is_luma,
              bd, strong, cell_px, is_dst, ts):
    top, left = gather_refs_qt(plane, x0, y0, size, order, bd, cell_px)
    pred = predict_block_np(top, left, mode, size, is_luma, bd, strong)
    blk = coeff_pl[y0 : y0 + size, x0 : x0 + size]
    if blk.any():
        log2 = size.bit_length() - 1
        d = tx.dequantize_np(blk[None], qp, log2, bd)[0]
        if ts:
            r = _inv_ts(d, bd)
        else:
            r = tx.inverse_transform_np(d[None], bd, is_dst=is_dst)[0]
        rec = np.clip(pred + r, 0, (1 << bd) - 1)
    else:
        rec = pred
    plane[y0 : y0 + size, x0 : x0 + size] = rec


def reconstruct_frame_full(fs, sps, qp: int):
    """I-slice reconstruction honoring fs.tu_log2/luma_mode4/ts maps."""
    w, h = fs.width, fs.height
    bd = sps.bit_depth
    y = np.zeros((h, w), np.int32)
    u = np.zeros((h // 2, w // 2), np.int32)
    v = np.zeros((h // 2, w // 2), np.int32)
    order4 = BlockOrder(w, h, sps.log2_ctu, cell_log2=2)
    order8 = BlockOrder(w, h, sps.log2_ctu)  # chroma 4-sample cells
    qpc = chroma_qp(qp)

    from .intra_qt import _cu_roots

    resolve = _chroma_resolver(fs)

    def luma_tb(x0, y0, log2):
        mode = int(fs.luma_mode4[y0 // 4, x0 // 4])
        ts = log2 == 2 and bool(fs.ts_y[y0 // 4, x0 // 4])
        _recon_tb(y, fs.coeff_y, x0, y0, 1 << log2, mode, order4, qp,
                  True, bd, sps.strong_intra_smoothing, 4,
                  is_dst=(log2 == 2), ts=ts)

    def chroma_tb(x0, y0, clog2, cmode_actual):
        cs = 1 << clog2
        cx, cy = x0 // 2, y0 // 2
        for pl, cf, tsm in ((u, fs.coeff_cb, fs.ts_cb),
                            (v, fs.coeff_cr, fs.ts_cr)):
            ts = clog2 == 2 and bool(tsm[cy // 4, cx // 4])
            _recon_tb(pl, cf, cx, cy, cs, cmode_actual, order8, qpc,
                      False, bd, False, 4, is_dst=False, ts=ts)

    def walk_tu(x0, y0, log2, cmode_actual):
        leaf = int(fs.tu_log2[y0 // 4, x0 // 4])
        if leaf >= 0 and leaf < log2:
            half = 1 << (log2 - 1)
            for sy in (0, half):
                for sx in (0, half):
                    walk_tu(x0 + sx, y0 + sy, log2 - 1, cmode_actual)
            if log2 == 3:
                chroma_tb(x0, y0, 2, cmode_actual)
            return
        luma_tb(x0, y0, log2)
        if log2 > 2:
            chroma_tb(x0, y0, log2 - 1, cmode_actual)

    for x8, y8 in _cu_roots(fs.cu_log2, order8):
        log2 = int(fs.cu_log2[y8, x8])
        x0, y0 = x8 * 8, y8 * 8
        cmode_actual = resolve(x8, y8)
        walk_tu(x0, y0, log2, cmode_actual)
    return y, u, v


def _chroma_resolver(fs):
    def resolve(x8, y8):
        cm = int(fs.chroma_mode[y8, x8])
        lm = int(fs.luma_mode4[y8 * 2, x8 * 2])  # PU0's mode (§8.4.3)
        if cm == 4:
            return lm
        m = (0, 26, 10, 1)[cm]
        return 34 if m == lm else m

    return resolve
