"""Tiles (§6.5.1): uniform tile grid, one independent slice segment per
tile. Geometry unit checks + e2e self-decode + HM reference oracle.

Reference counterpart: TComPicSym tile maps (TComPicSym.cpp:501
xInitTiles) and TEncSlice's per-tile slice boundaries (TEncSlice.cpp:650).
"""

import os
import subprocess

import numpy as np
import pytest

from tpuhevc.codec.decoder import decode_stream
from tpuhevc.codec.encoder import Encoder
from tpuhevc.codec.params import EncoderConfig, SeqParams
from tpuhevc.codec.tiles import tile_bounds, tile_layout

HM_DEC = "/tmp/hmref/TAppDecoder"


class _Sps:
    pic_width_in_ctus = 4
    pic_height_in_ctus = 3


class _Pps:
    tiles_enabled = True
    num_tile_columns = 2
    num_tile_rows = 2


def test_tile_bounds_uniform():
    # HM's (i * size) / n split: 5 CTUs over 2 tiles -> 2 + 3
    assert tile_bounds(5, 2) == [0, 2, 5]
    assert tile_bounds(4, 2) == [0, 2, 4]
    assert tile_bounds(7, 3) == [0, 2, 4, 7]


def test_tile_layout_scan_order():
    order, tile_of, spans = tile_layout(_Sps, _Pps)
    # 4x3 CTUs, 2x2 tiles: cols 2+2, rows 1+2
    assert len(order) == 12 and sorted(order) == list(range(12))
    assert len(spans) == 4
    # tile 0 = top-left (row 0, cols 0-1)
    assert spans[0] == [0, 1]
    # tile 1 = top-right
    assert spans[1] == [2, 3]
    # tile 2 = bottom-left (rows 1-2, cols 0-1), raster inside tile
    assert spans[2] == [4, 5, 8, 9]
    assert spans[3] == [6, 7, 10, 11]
    assert [tile_of[rs] for rs in (0, 2, 4, 6)] == [0, 1, 2, 3]
    # coding order = concatenated spans
    assert order == [a for s in spans for a in s]


def _clip(w, h, n, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0 : h + 32, 0 : w + 32].astype(np.float32)
    base = np.clip(
        128 + 60 * np.sin(xx / 17.0) + 45 * np.cos(yy / 13.0)
        + rng.integers(-10, 11, yy.shape), 0, 255).astype(np.uint8)
    out = []
    for t in range(n):
        dx, dy = (2 * t) % 16, t % 16
        y = base[dy : dy + h, dx : dx + w]
        u = np.full((h // 2, w // 2), 100 + t, np.uint8)
        v = np.full((h // 2, w // 2), 150 - t, np.uint8)
        out.append((y, u, v))
    return out


def _roundtrip(cfg, n_frames, tmp_path, tag):
    enc = Encoder(cfg)
    w, h = cfg.sps.width, cfg.sps.height
    for i, fr in enumerate(_clip(w, h, n_frames)):
        enc.encode_frame(*fr, poc=i)
    bs = enc.bitstream()
    frames = decode_stream(bs)
    assert len(frames) == n_frames
    assert all(f.md5_ok for f in frames), [f.md5_ok for f in frames]
    if os.path.exists(HM_DEC):
        p = tmp_path / f"{tag}.bin"
        p.write_bytes(bs)
        out = subprocess.run(
            [HM_DEC, "-b", str(p), "-o", str(tmp_path / f"{tag}.yuv")],
            capture_output=True, text=True, timeout=180)
        assert out.returncode == 0, out.stderr
        assert out.stdout.count("(OK)") == n_frames, out.stdout
        assert "ERROR" not in out.stdout
    return enc


def _tiled_cfg(w, h, qp, cols, rows, **kw):
    cfg = EncoderConfig(sps=SeqParams(width=w, height=h,
                                      max_tu_depth_intra=0),
                        qp=qp, **kw)
    cfg.pps.tiles_enabled = True
    cfg.pps.num_tile_columns = cols
    cfg.pps.num_tile_rows = rows
    return cfg


def test_tiles_all_intra(tmp_path):
    # 512x128 = 8x2 CTUs; A.4.1 minima: tile columns >= 256 luma samples
    # (4 CTUs), rows >= 64 -> 2x2 tiles is the smallest legal grid here
    cfg = _tiled_cfg(512, 128, 32, 2, 2, intra_period=1)
    enc = _roundtrip(cfg, 2, tmp_path, "tiles_ai")
    # one NAL per tile per frame (+ parameter sets + hash SEIs)
    vcl = sum(1 for n in enc.nals if ((n[0] >> 1) & 0x3F) < 32)
    assert vcl == 2 * 4


def test_tiles_ldp(tmp_path):
    cfg = _tiled_cfg(512, 128, 32, 2, 1, intra_period=-1)
    _roundtrip(cfg, 3, tmp_path, "tiles_ldp")


def test_slices_all_intra(tmp_path):
    # 192x128 = 3x2 CTUs, 2 CTUs per slice -> 3 slice segments/picture
    cfg = EncoderConfig(sps=SeqParams(width=192, height=128,
                                      max_tu_depth_intra=0),
                        qp=32, intra_period=1, slice_ctus=2)
    enc = _roundtrip(cfg, 2, tmp_path, "slices_ai")
    vcl = sum(1 for n in enc.nals if ((n[0] >> 1) & 0x3F) < 32)
    assert vcl == 2 * 3


def test_slices_ldp(tmp_path):
    cfg = EncoderConfig(sps=SeqParams(width=192, height=128,
                                      max_tu_depth_intra=0),
                        qp=32, intra_period=-1, slice_ctus=4)
    _roundtrip(cfg, 3, tmp_path, "slices_ldp")


def test_segment_spans_slices():
    from tpuhevc.codec.tiles import segment_spans

    class _S:
        pic_width_in_ctus = 3
        pic_height_in_ctus = 2

    class _P:
        tiles_enabled = False

    spans = segment_spans(_S, _P, 4)
    assert spans == [[0, 1, 2, 3], [4, 5]]


def test_tiles_pps_roundtrip():
    from tpuhevc.entropy.headers import parse_pps, write_pps

    cfg = _tiled_cfg(192, 128, 32, 3, 2)
    pps2 = parse_pps(write_pps(cfg.pps))
    assert pps2.tiles_enabled
    assert pps2.num_tile_columns == 3
    assert pps2.num_tile_rows == 2
