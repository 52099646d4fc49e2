"""Motion-vector prediction: merge and AMVP candidate derivation.

Counterpart of TComDataCU's getInterMergeCandidates / fillMvpCand
(SURVEY.md §2.1 "CU data model"), per H.265 §8.5.3.2.3/.2.6, specialized to
the P-slice single-reference configuration this framework currently emits
(one list, refIdx 0, no TMVP -> no scaling paths). Shared verbatim by the
encoder's decision pass, the syntax coder, and the decoder, so derivation
cannot diverge.

MV field granularity: one MV per 8x8 cell (the minimum PU this framework
emits); a CU spanning k cells replicates its MV into each.
"""

from __future__ import annotations

import numpy as np

from .refsamples import BlockOrder


class MvField:
    def __init__(self, w8: int, h8: int):
        self.mv = np.zeros((h8, w8, 2), dtype=np.int32)  # quarter-pel
        self.valid = np.zeros((h8, w8), dtype=bool)  # coded + inter
        self.w8 = w8
        self.h8 = h8

    def set_cu(self, x0: int, y0: int, size: int, mv) -> None:
        s8 = size // 8
        x8, y8 = x0 // 8, y0 // 8
        self.mv[y8 : y8 + s8, x8 : x8 + s8] = mv
        self.valid[y8 : y8 + s8, x8 : x8 + s8] = True

    def at(self, x8: int, y8: int):
        if 0 <= x8 < self.w8 and 0 <= y8 < self.h8 and self.valid[y8, x8]:
            return tuple(int(v) for v in self.mv[y8, x8])
        return None


def _neighbor(field: MvField, order: BlockOrder, cur_cell, px: int, py: int):
    """MV of the PU covering sample (px, py), if available in decode order."""
    if px < 0 or py < 0:
        return None
    x8, y8 = px // 8, py // 8
    if not order.precedes(x8, y8, cur_cell[0], cur_cell[1]):
        return None
    return field.at(x8, y8)


def merge_candidates(field: MvField, order: BlockOrder, x0: int, y0: int,
                     size: int, max_cand: int = 5) -> list[tuple[int, int]]:
    """Spatial merge list (§8.5.3.2.3) + zero fill. P slice, refIdx 0."""
    cur = (x0 // 8, y0 // 8)
    n = size
    a1 = _neighbor(field, order, cur, x0 - 1, y0 + n - 1)
    b1 = _neighbor(field, order, cur, x0 + n - 1, y0 - 1)
    b0 = _neighbor(field, order, cur, x0 + n, y0 - 1)
    a0 = _neighbor(field, order, cur, x0 - 1, y0 + n)
    b2 = _neighbor(field, order, cur, x0 - 1, y0 - 1)
    out: list[tuple[int, int]] = []
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
    while len(out) < max_cand:
        out.append((0, 0))
    return out[:max_cand]


def amvp_candidates(field: MvField, order: BlockOrder, x0: int, y0: int,
                    size: int) -> list[tuple[int, int]]:
    """AMVP list (§8.5.3.2.6): candA = first of {A0, A1}, candB = first of
    {B0, B1, B2}, dedup, zero-fill to 2. Single ref -> no scaling."""
    cur = (x0 // 8, y0 // 8)
    n = size
    cand_a = None
    for px, py in ((x0 - 1, y0 + n), (x0 - 1, y0 + n - 1)):
        cand_a = _neighbor(field, order, cur, px, py)
        if cand_a is not None:
            break
    cand_b = None
    for px, py in ((x0 + n, y0 - 1), (x0 + n - 1, y0 - 1), (x0 - 1, y0 - 1)):
        cand_b = _neighbor(field, order, cur, px, py)
        if cand_b is not None:
            break
    out = []
    if cand_a is not None:
        out.append(cand_a)
    if cand_b is not None and cand_b != cand_a:
        out.append(cand_b)
    while len(out) < 2:
        out.append((0, 0))
    return out[:2]
