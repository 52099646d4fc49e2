"""Two-list (B slice) motion field + merge/AMVP derivation.

Generalizes codec/mv.py to bi-prediction per H.265 §8.5.3.2.3 (merge,
inheriting inter_pred_idc + both lists) and §8.5.3.2.7 (AMVP for a target
(list, refIdx) with cross-list neighbor usage and POC scaling). Shared by
the B-frame encoder walk, the syntax coder, and the decoder. No TMVP.

Candidate tuples: (inter_dir, mv0x, mv0y, ref0, mv1x, mv1y, ref1) with
inter_dir 1 = L0, 2 = L1, 3 = BI; unused-list fields are (0, 0, -1).
"""

from __future__ import annotations

import numpy as np

from .mv import scale_mv
from .refsamples import BlockOrder


class MvFieldB:
    def __init__(self, w8: int, h8: int):
        self.mv = np.zeros((h8, w8, 2, 2), dtype=np.int32)  # [list][xy]
        self.ref = np.full((h8, w8, 2), -1, dtype=np.int32)
        self.inter_dir = np.zeros((h8, w8), dtype=np.int32)  # 0 = not coded
        self.w8 = w8
        self.h8 = h8

    def set_cu(self, x0, y0, size, inter_dir, mv0, ref0, mv1, ref1):
        s8 = size // 8
        x8, y8 = x0 // 8, y0 // 8
        self.inter_dir[y8 : y8 + s8, x8 : x8 + s8] = inter_dir
        self.mv[y8 : y8 + s8, x8 : x8 + s8, 0] = mv0
        self.mv[y8 : y8 + s8, x8 : x8 + s8, 1] = mv1
        self.ref[y8 : y8 + s8, x8 : x8 + s8, 0] = ref0 if inter_dir & 1 else -1
        self.ref[y8 : y8 + s8, x8 : x8 + s8, 1] = ref1 if inter_dir & 2 else -1

    def at(self, x8, y8):
        if not (0 <= x8 < self.w8 and 0 <= y8 < self.h8):
            return None
        d = int(self.inter_dir[y8, x8])
        if d == 0:
            return None
        return (d,
                int(self.mv[y8, x8, 0, 0]), int(self.mv[y8, x8, 0, 1]),
                int(self.ref[y8, x8, 0]),
                int(self.mv[y8, x8, 1, 0]), int(self.mv[y8, x8, 1, 1]),
                int(self.ref[y8, x8, 1]))


def _neighbor(field, order, cur_cell, px, py):
    if px < 0 or py < 0:
        return None
    x8, y8 = px // 8, py // 8
    if not order.precedes(x8, y8, cur_cell[0], cur_cell[1]):
        return None
    return field.at(x8, y8)


def merge_candidates_b(field: MvFieldB, order: BlockOrder, x0, y0, size,
                       max_cand, num_ref0, num_ref1, l0_pocs=None,
                       l1_pocs=None):
    """Spatial merge list for B slices + bi zero fill."""
    cur = (x0 // 8, y0 // 8)
    n = size
    a1 = _neighbor(field, order, cur, x0 - 1, y0 + n - 1)
    b1 = _neighbor(field, order, cur, x0 + n - 1, y0 - 1)
    b0 = _neighbor(field, order, cur, x0 + n, y0 - 1)
    a0 = _neighbor(field, order, cur, x0 - 1, y0 + n)
    b2 = _neighbor(field, order, cur, x0 - 1, y0 - 1)
    out = []
    if a1 is not None:
        out.append(a1)
    if b1 is not None and b1 != a1:
        out.append(b1)
    if b0 is not None and b0 != b1:
        out.append(b0)
    if a0 is not None and a0 != a1:
        out.append(a0)
    if len(out) < 4 and b2 is not None and b2 != a1 and b2 != b1:
        out.append(b2)
    # combined bi-predictive candidates (§8.5.3.2.4): pairs of existing
    # candidates' L0/L1 parts, in the fixed combination order
    _L0_IDX = (0, 1, 0, 2, 1, 2, 0, 3, 1, 3, 2, 3)
    _L1_IDX = (1, 0, 2, 0, 2, 1, 3, 0, 3, 1, 3, 2)
    if num_ref1 > 0 and len(out) > 1:
        norig = len(out)
        k = 0
        while len(out) < max_cand and k < norig * (norig - 1) \
                and k < len(_L0_IDX):
            i0, i1 = _L0_IDX[k], _L1_IDX[k]
            k += 1
            if i0 >= norig or i1 >= norig:
                continue
            c0, c1 = out[i0], out[i1]
            if not (c0[0] & 1) or not (c1[0] & 2):
                continue
            # skip when the two parts reference the same picture with the
            # same MV (§8.5.3.2.4 availability condition)
            if l0_pocs is not None and l1_pocs is not None \
                    and l0_pocs[c0[3]] == l1_pocs[c1[6]] \
                    and (c0[1], c0[2]) == (c1[4], c1[5]):
                continue
            out.append((3, c0[1], c0[2], c0[3], c1[4], c1[5], c1[6]))
    # zero candidates, refs cycling through min(num_ref0, num_ref1)
    zero_i = 0
    nmin = min(num_ref0, num_ref1) if num_ref1 > 0 else num_ref0
    while len(out) < max_cand:
        r = zero_i if zero_i < nmin else 0
        if num_ref1 > 0:
            out.append((3, 0, 0, r, 0, 0, r))
        else:
            out.append((1, 0, 0, r, 0, 0, -1))
        zero_i += 1
    return out[:max_cand]


def amvp_candidates_b(field: MvFieldB, order: BlockOrder, x0, y0, size,
                      target_list: int, target_ref: int,
                      list_pocs, cur_poc: int):
    """AMVP for (target_list, target_ref) per §8.5.3.2.7 structure
    (fillMvpCand): left pass gated on A-PU existence, above unscaled pass,
    scaled-above appended when no A PU. Cross-list neighbor usage: same-POC
    check tries the target list then the other list; scaling likewise.
    list_pocs: [l0_pocs, l1_pocs]."""
    cur = (x0 // 8, y0 // 8)
    n = size
    tpoc = list_pocs[target_list][target_ref]

    nb_a = [_neighbor(field, order, cur, x0 - 1, y0 + n),
            _neighbor(field, order, cur, x0 - 1, y0 + n - 1)]
    nb_b = [_neighbor(field, order, cur, x0 + n, y0 - 1),
            _neighbor(field, order, cur, x0 + n - 1, y0 - 1),
            _neighbor(field, order, cur, x0 - 1, y0 - 1)]
    is_scaled = any(nb is not None for nb in nb_a)

    def parts(nb):
        """[(mv, poc)] for each used list of the neighbor, target list
        first."""
        res = []
        for lx in (target_list, 1 - target_list):
            if nb[0] & (1 << lx) and nb[3 + 3 * lx] >= 0:
                mv = (nb[1 + 3 * lx], nb[2 + 3 * lx])
                res.append((mv, list_pocs[lx][nb[3 + 3 * lx]]))
        return res

    def unscaled(nbs):
        for nb in nbs:
            if nb is None:
                continue
            for mv, poc in parts(nb):
                if poc == tpoc:
                    return mv
        return None

    def scaled(nbs):
        for nb in nbs:
            if nb is None:
                continue
            ps = parts(nb)
            if ps:
                mv, poc = ps[0]
                return scale_mv(mv, cur_poc - tpoc, cur_poc - poc)
        return None

    out = []
    if is_scaled:
        c = unscaled(nb_a)
        if c is None:
            c = scaled(nb_a)
        if c is not None:
            out.append(c)
    c = unscaled(nb_b)
    if c is not None:
        out.append(c)
    if not is_scaled:
        c = scaled(nb_b)
        if c is not None:
            out.append(c)
    if len(out) == 2 and out[0] == out[1]:
        out = out[:1]
    while len(out) < 2:
        out.append((0, 0))
    return out[:2]
