"""Tile geometry (§6.5.1): uniform-spacing tile grid + the tile-scan
CTU coding order.

Counterpart of the reference's TComPicSym tile maps
(TComPicSym.cpp:501 initTiles / CtuTsToRsAddrMap): boundaries follow
the (i * size) / n uniform split, CTUs are coded raster-inside-tile
with tiles in raster order.
"""

from __future__ import annotations

import numpy as np


def tile_bounds(n_ctus: int, n_tiles: int) -> list[int]:
    """Uniform boundaries: [0, ..., n_ctus] with n_tiles spans."""
    return [(i * n_ctus) // n_tiles for i in range(n_tiles + 1)]


def tile_layout(sps, pps):
    """Returns (order, tile_of, spans):
    - order: CTU raster-scan addresses in tile-scan coding order
    - tile_of: per-CTU (raster index) tile id
    - spans: per tile, the list of its CTU raster addresses (in coding
      order) — one slice segment per tile uses spans directly."""
    wc, hc = sps.pic_width_in_ctus, sps.pic_height_in_ctus
    nc = pps.num_tile_columns if pps.tiles_enabled else 1
    nr = pps.num_tile_rows if pps.tiles_enabled else 1
    col_bd = tile_bounds(wc, nc)
    row_bd = tile_bounds(hc, nr)
    order = []
    tile_of = np.zeros(wc * hc, np.int32)
    spans = []
    tid = 0
    for tr in range(nr):
        for tc in range(nc):
            span = []
            for cy in range(row_bd[tr], row_bd[tr + 1]):
                for cx in range(col_bd[tc], col_bd[tc + 1]):
                    rs = cy * wc + cx
                    order.append(rs)
                    tile_of[rs] = tid
                    span.append(rs)
            spans.append(span)
            tid += 1
    return order, tile_of, spans


def block_order_for(sps, pps, cell_log2: int = 3):
    """BlockOrder following the tile-scan coding order with one slice
    segment per tile (the shape this encoder emits): per-cell slice_min
    ranks gate reference/candidate availability at tile boundaries."""
    from .refsamples import BlockOrder

    w, h = sps.coded_width, sps.coded_height
    if not pps.tiles_enabled:
        return BlockOrder(w, h, sps.log2_ctu, cell_log2)
    order_rs, tile_of, spans = tile_layout(sps, pps)
    nctu = len(order_rs)
    ctu_rank = np.empty(nctu, np.int64)
    for rank, rs in enumerate(order_rs):
        ctu_rank[rs] = rank
    per_ctu = (1 << (sps.log2_ctu - cell_log2)) ** 2
    first_rank = {}  # tile id -> coding rank of its first CTU
    for tid, span in enumerate(spans):
        first_rank[tid] = int(ctu_rank[span[0]])
    c = cell_log2
    w8, h8 = w >> c, h >> c
    cells_side = 1 << (sps.log2_ctu - c)
    slice_min = np.empty((h8, w8), np.int64)
    wc = sps.pic_width_in_ctus
    for y8 in range(h8):
        for x8 in range(w8):
            rs = (y8 // cells_side) * wc + (x8 // cells_side)
            slice_min[y8, x8] = first_rank[int(tile_of[rs])] * per_ctu
    return BlockOrder(w, h, sps.log2_ctu, c, ctu_rank=ctu_rank,
                      slice_min=slice_min)
