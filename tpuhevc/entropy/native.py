"""ctypes binding for the native entropy encoder (byte-identical fast path
of encode_slice_data; built by tools/build_native.sh, auto-built on first
use when a compiler is available)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))),
        "native", "libtpuhevc_entropy.so")


def get_lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        script = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))),
            "tools", "build_native.sh")
        try:
            subprocess.run(["bash", script], check=True, capture_output=True,
                           timeout=300)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.tpuhevc_encode_slice_data.restype = ctypes.c_int
    lib.tpuhevc_encode_slice_data.argtypes = [
        ctypes.POINTER(ctypes.c_int32)] * 12 + [ctypes.c_int] * 14 + [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    if hasattr(lib, "tpuhevc_encode_slice_data_sao"):
        lib.tpuhevc_encode_slice_data_sao.restype = ctypes.c_int
        lib.tpuhevc_encode_slice_data_sao.argtypes = (
            [ctypes.POINTER(ctypes.c_int32)] * 13 + [ctypes.c_int] * 16
            + [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int])
    if hasattr(lib, "tpuhevc_encode_slice_data_v3"):
        lib.tpuhevc_encode_slice_data_v3.restype = ctypes.c_int
        lib.tpuhevc_encode_slice_data_v3.argtypes = (
            [ctypes.POINTER(ctypes.c_int32)] * 13 + [ctypes.c_int] * 2
            + [ctypes.POINTER(ctypes.c_int32)] * 2 + [ctypes.c_int] * 15
            + [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int])
    if hasattr(lib, "tpuhevc_encode_slice_data_v5"):
        lib.tpuhevc_encode_slice_data_v5.restype = ctypes.c_int
        lib.tpuhevc_encode_slice_data_v5.argtypes = (
            [ctypes.POINTER(ctypes.c_int32)] * 13 + [ctypes.c_int] * 2
            + [ctypes.POINTER(ctypes.c_int32)] * 2 + [ctypes.c_int]
            + [ctypes.POINTER(ctypes.c_int32)] + [ctypes.c_int] * 14
            + [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
               ctypes.POINTER(ctypes.c_int32)])
    if hasattr(lib, "tpuhevc_decision_walk"):
        lib.tpuhevc_decision_walk.restype = ctypes.c_int
        lib.tpuhevc_decision_walk.argtypes = (
            [ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
             ctypes.POINTER(ctypes.c_uint8),
             ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
             ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8)]
            + [ctypes.c_int] * 5
            + [ctypes.POINTER(ctypes.c_int32)] * 8)
    if hasattr(lib, "tpuhevc_decision_walk_map"):
        lib.tpuhevc_decision_walk_map.restype = ctypes.c_int
        lib.tpuhevc_decision_walk_map.argtypes = (
            [ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
             ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8)]
            + [ctypes.c_int] * 5
            + [ctypes.POINTER(ctypes.c_int32)] * 8)
    if hasattr(lib, "tpuhevc_decision_walk_map_part"):
        lib.tpuhevc_decision_walk_map_part.restype = ctypes.c_int
        lib.tpuhevc_decision_walk_map_part.argtypes = (
            [ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32)]
            + [ctypes.POINTER(ctypes.c_uint8)] * 3
            + [ctypes.c_int] * 5
            + [ctypes.POINTER(ctypes.c_int32)] * 8)
    if hasattr(lib, "tpuhevc_decision_walk_map_col"):
        lib.tpuhevc_decision_walk_map_col.restype = ctypes.c_int
        lib.tpuhevc_decision_walk_map_col.argtypes = (
            [ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32)]
            + [ctypes.POINTER(ctypes.c_uint8)] * 3
            + [ctypes.POINTER(ctypes.c_int32)] * 2
            + [ctypes.c_int] * 5
            + [ctypes.POINTER(ctypes.c_int32)] * 8)
    _LIB = lib
    return _LIB


def decision_walk_map_native(log2_map, mv_map, ref_map, cbf_map, W, H,
                             log2_ctu, max_merge, num_ref: int = 1,
                             part_map=None, col=None):
    """v2/v3/v4 native walk: final per-8x8-cell (cu_log2, mv, ref, cbf[,
    part]) maps from the device stage -> FrameSyntax merge/skip/AMVP
    maps (per-PU at PU-origin cells for rectangular partitions), or
    None if the library is unavailable. col: optional TMVP collocated
    motion (col_mv16 (h16, w16, 2) int32, col_td16 (h16, w16) int32 —
    POC distance col picture -> its ref per 16-block, 0 = invalid)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "tpuhevc_decision_walk_map"):
        return None
    use_part = part_map is not None and np.any(part_map)
    if use_part and not hasattr(lib, "tpuhevc_decision_walk_map_part"):
        return None
    if col is not None and not hasattr(lib, "tpuhevc_decision_walk_map_col"):
        return None
    h8, w8 = H // 8, W // 8
    lm = np.ascontiguousarray(log2_map, dtype=np.uint8)
    mv_in = np.ascontiguousarray(mv_map, dtype=np.int32)
    rf = np.ascontiguousarray(ref_map, dtype=np.uint8)
    cb = np.ascontiguousarray(cbf_map, dtype=np.uint8)
    outs = [np.zeros((h8, w8), np.int32) for _ in range(6)]
    mv = np.zeros((h8, w8, 2), np.int32)
    mvd = np.zeros((h8, w8, 2), np.int32)
    arrs = [outs[0], mv, outs[1], outs[2], outs[3], outs[4], outs[5], mvd]
    outp = [a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) for a in arrs]
    if col is not None:
        cmv = np.ascontiguousarray(col[0], dtype=np.int32)
        ctd = np.ascontiguousarray(col[1], dtype=np.int32)
        pm = np.ascontiguousarray(
            part_map if part_map is not None else np.zeros((h8, w8)),
            dtype=np.uint8)
        rc = lib.tpuhevc_decision_walk_map_col(
            lm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            mv_in.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            pm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cmv.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctd.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            W, H, log2_ctu, max_merge, num_ref, *outp)
        if rc != 0:
            return None
        cu_log2, ref, skipf, merge_flag, merge_idx, mvp_flag = outs
        return dict(cu_log2=cu_log2, mv=mv, ref=ref, skip=skipf,
                    merge_flag=merge_flag, merge_idx=merge_idx,
                    mvp_flag=mvp_flag, mvd=mvd)
    if use_part:
        pm = np.ascontiguousarray(part_map, dtype=np.uint8)
        rc = lib.tpuhevc_decision_walk_map_part(
            lm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            mv_in.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            pm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            W, H, log2_ctu, max_merge, num_ref, *outp)
    else:
        rc = lib.tpuhevc_decision_walk_map(
            lm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            mv_in.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            W, H, log2_ctu, max_merge, num_ref, *outp)
    if rc != 0:
        return None
    cu_log2, ref, skipf, merge_flag, merge_idx, mvp_flag = outs
    return dict(cu_log2=cu_log2, mv=mv, ref=ref, skip=skipf,
                merge_flag=merge_flag, merge_idx=merge_idx,
                mvp_flag=mvp_flag, mvd=mvd)


def decision_walk_native(mvq16, cbf16, mvq32, cbf32, use32, W, H,
                         log2_ctu, max_merge, ref16=None, ref32=None,
                         num_ref: int = 1):
    """Native decode-order merge/skip/AMVP walk (inter_grid fast path).
    Returns the per-8x8 FrameSyntax maps, or None if unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "tpuhevc_decision_walk"):
        return None
    h8, w8 = H // 8, W // 8
    if ref16 is None:
        ref16 = np.zeros(np.asarray(cbf16).shape, np.uint8)
    if ref32 is None:
        ref32 = np.zeros(np.asarray(cbf32).shape, np.uint8)

    def i32p(a):
        a = np.ascontiguousarray(a, dtype=np.int32)
        return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    def u8p(a):
        a = np.ascontiguousarray(a, dtype=np.uint8)
        return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    ins = [i32p(mvq16), u8p(ref16), u8p(cbf16), i32p(mvq32), u8p(ref32),
           u8p(cbf32), u8p(use32)]
    outs = [np.zeros((h8, w8), np.int32) for _ in range(6)]
    mv = np.zeros((h8, w8, 2), np.int32)
    mvd = np.zeros((h8, w8, 2), np.int32)
    # order: cu_log2, mv, ref, skip, merge_flag, merge_idx, mvp_flag, mvd
    arrs = [outs[0], mv, outs[1], outs[2], outs[3], outs[4], outs[5], mvd]
    outp = [a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) for a in arrs]
    rc = lib.tpuhevc_decision_walk(
        *[p for _, p in ins], W, H, log2_ctu, max_merge, num_ref, *outp)
    if rc != 0:
        return None
    cu_log2, ref, skipf, merge_flag, merge_idx, mvp_flag = outs
    return dict(cu_log2=cu_log2, mv=mv, ref=ref, skip=skipf,
                merge_flag=merge_flag, merge_idx=merge_idx,
                mvp_flag=mvp_flag, mvd=mvd)


def encode_slice_data_native(fs, sps, pps, slice_type_row: int, qp: int,
                             slice_type: int = 2, max_merge: int = 5,
                             num_ref: int = 1,
                             ctx_out: np.ndarray | None = None
                             ) -> bytes | None:
    """Full slice-data payload (CABAC bytes + rbsp trailing), or None if
    the native library is unavailable (or it predates a feature the
    frame uses: SAO, rectangular PUs, intra-in-P). slice_type: 2 = I,
    1 = P. ctx_out: optional caller-allocated int32[NUM_CTX] buffer the
    coder fills with the end-of-slice CABAC context states (the adaptive
    bit-estimator's feedback source; needs the v5 library)."""
    lib = get_lib()
    if lib is None:
        return None
    if pps.cu_qp_delta_enabled:
        return None  # per-CTU QP deltas ride the python slice coder
    if fs.sao is not None and not hasattr(lib, "tpuhevc_encode_slice_data_sao"):
        return None
    has_v3 = hasattr(lib, "tpuhevc_encode_slice_data_v3")
    has_intra_p = (slice_type != 2 and fs.inter_dir is not None
                   and bool((fs.inter_dir == 0).any()))
    part_mode = getattr(fs, "part_mode", None)
    has_parts = (slice_type != 2 and part_mode is not None
                 and bool(np.any(part_mode)))
    if (has_intra_p or has_parts) and not has_v3:
        return None  # python slice coder handles these on old libs
    # v4: explicit TU splits below the CU (fs.tu_log2 leaves < CU size)
    tu8 = np.asarray(fs.tu_log2)[::2, ::2]
    exp8 = np.minimum(np.asarray(fs.cu_log2), 5)
    if slice_type == 2 and (
            bool(np.asarray(fs.nxn).any())
            or bool(((tu8 >= 2) & (tu8 < exp8)).any())):
        return None  # I-slice NxN PUs / TU splits: python writer
    has_tsplit = (slice_type != 2
                  and bool(((tu8 >= 2) & (tu8 < exp8)).any()))
    if has_tsplit and (not hasattr(lib, "tpuhevc_encode_slice_data_v4")
                       or bool((tu8 == 2).any())):
        return None  # python writer handles (incl. 4x4 leaf chroma)
    if has_intra_p:
        # native intra-in-P covers square whole-CU intra only: no NxN
        # (luma_mode4 uniform per 8-cell), no transform-skip, TU = CU
        im = fs.inter_dir == 0
        im4 = np.repeat(np.repeat(im, 2, 0), 2, 1)
        m4 = np.repeat(np.repeat(np.asarray(fs.luma_mode), 2, 0), 2, 1)
        exp_tu = np.minimum(
            np.repeat(np.repeat(np.asarray(fs.cu_log2), 2, 0), 2, 1), 5)
        if (bool((np.asarray(fs.luma_mode4)[im4] != m4[im4]).any())
                or bool(np.asarray(fs.ts_y)[im4].any())
                or bool(np.asarray(fs.ts_cb)[im].any())
                or bool(np.asarray(fs.ts_cr)[im].any())
                or bool((np.asarray(fs.tu_log2)[im4] != exp_tu[im4]).any())):
            return None

    def ptr(a):
        a = np.ascontiguousarray(a, dtype=np.int32)
        return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    keep = []
    ptrs = []
    for arr in (fs.cu_log2, fs.luma_mode, fs.chroma_mode, fs.coeff_y,
                fs.coeff_cb, fs.coeff_cr, fs.skip, fs.merge_flag,
                fs.merge_idx, fs.mvp_flag, fs.mvd, fs.ref_idx):
        a, p = ptr(arr)
        keep.append(a)
        ptrs.append(p)
    cap = fs.width * fs.height * 4 + 1024
    out = np.empty(cap, dtype=np.uint8)
    if hasattr(lib, "tpuhevc_encode_slice_data_v5"):
        # v5 is a superset of every earlier entry: one call site, with
        # the optional end-of-slice context snapshot
        nullp = ctypes.POINTER(ctypes.c_int32)()
        sao_p, sao_l, sao_c = nullp, 0, 0
        if fs.sao is not None:
            pp = fs.sao
            nctu = pp.ny * pp.nx
            pack = np.zeros((nctu, 18), np.int32)
            pack[:, 0] = pp.type_y.reshape(-1)
            pack[:, 1] = pp.aux_y.reshape(-1)
            pack[:, 2:6] = pp.off_y.reshape(nctu, 4)
            pack[:, 6] = pp.type_c.reshape(-1)
            pack[:, 7] = pp.aux_cb.reshape(-1)
            pack[:, 8:12] = pp.off_cb.reshape(nctu, 4)
            pack[:, 12] = pp.aux_cr.reshape(-1)
            pack[:, 13:17] = pp.off_cr.reshape(nctu, 4)
            pack[:, 17] = pp.merge.reshape(-1)
            a, sao_p = ptr(pack)
            keep.append(a)
            sao_l, sao_c = int(pp.luma_on), int(pp.chroma_on)
        part_p = dir_p = want_p = nullp
        if has_parts:
            a, part_p = ptr(part_mode)
            keep.append(a)
        if has_intra_p:
            a, dir_p = ptr(fs.inter_dir)
            keep.append(a)
        if has_tsplit:
            a, want_p = ptr(tu8)
            keep.append(a)
        if ctx_out is not None:
            assert ctx_out.dtype == np.int32 and ctx_out.size >= 202
            ctx_p = ctx_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        else:
            ctx_p = nullp
        n = lib.tpuhevc_encode_slice_data_v5(
            *ptrs, sao_p, sao_l, sao_c, part_p, dir_p,
            1 if sps.amp_enabled else 0, want_p,
            fs.width, fs.height, sps.log2_ctu, sps.log2_min_cu,
            sps.log2_min_tu, sps.log2_max_tu, sps.max_tu_depth_intra,
            sps.max_tu_depth_inter, slice_type, max_merge,
            slice_type_row, qp, 1 if pps.sign_data_hiding else 0,
            num_ref,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
            ctx_p)
        if n < 0:
            return None
        return out[:n].tobytes()
    if has_intra_p or has_parts or has_tsplit:
        nullp = ctypes.POINTER(ctypes.c_int32)()
        sao_p, sao_l, sao_c = nullp, 0, 0
        if fs.sao is not None:
            pp = fs.sao
            nctu = pp.ny * pp.nx
            pack = np.zeros((nctu, 18), np.int32)
            pack[:, 0] = pp.type_y.reshape(-1)
            pack[:, 1] = pp.aux_y.reshape(-1)
            pack[:, 2:6] = pp.off_y.reshape(nctu, 4)
            pack[:, 6] = pp.type_c.reshape(-1)
            pack[:, 7] = pp.aux_cb.reshape(-1)
            pack[:, 8:12] = pp.off_cb.reshape(nctu, 4)
            pack[:, 12] = pp.aux_cr.reshape(-1)
            pack[:, 13:17] = pp.off_cr.reshape(nctu, 4)
            pack[:, 17] = pp.merge.reshape(-1)
            a, sao_p = ptr(pack)
            keep.append(a)
            sao_l, sao_c = int(pp.luma_on), int(pp.chroma_on)
        if has_parts:
            a, part_p = ptr(part_mode)
            keep.append(a)
        else:
            part_p = nullp
        if has_intra_p:
            a, dir_p = ptr(fs.inter_dir)
            keep.append(a)
        else:
            dir_p = nullp
        if has_tsplit:
            a, want_p = ptr(tu8)
            keep.append(a)
            n = lib.tpuhevc_encode_slice_data_v4(
                *ptrs, sao_p, sao_l, sao_c, part_p, dir_p,
                1 if sps.amp_enabled else 0, want_p,
                fs.width, fs.height, sps.log2_ctu, sps.log2_min_cu,
                sps.log2_min_tu, sps.log2_max_tu, sps.max_tu_depth_intra,
                sps.max_tu_depth_inter, slice_type, max_merge,
                slice_type_row, qp, 1 if pps.sign_data_hiding else 0,
                num_ref,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
        else:
            n = lib.tpuhevc_encode_slice_data_v3(
                *ptrs, sao_p, sao_l, sao_c, part_p, dir_p,
                1 if sps.amp_enabled else 0,
                fs.width, fs.height, sps.log2_ctu, sps.log2_min_cu,
                sps.log2_min_tu, sps.log2_max_tu, sps.max_tu_depth_intra,
                sps.max_tu_depth_inter, slice_type, max_merge,
                slice_type_row, qp, 1 if pps.sign_data_hiding else 0,
                num_ref,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
        if n < 0:
            return None
        return out[:n].tobytes()
    if fs.sao is not None:
        pp = fs.sao
        nctu = pp.ny * pp.nx
        pack = np.zeros((nctu, 18), np.int32)
        pack[:, 0] = pp.type_y.reshape(-1)
        pack[:, 1] = pp.aux_y.reshape(-1)
        pack[:, 2:6] = pp.off_y.reshape(nctu, 4)
        pack[:, 6] = pp.type_c.reshape(-1)
        pack[:, 7] = pp.aux_cb.reshape(-1)
        pack[:, 8:12] = pp.off_cb.reshape(nctu, 4)
        pack[:, 12] = pp.aux_cr.reshape(-1)
        pack[:, 13:17] = pp.off_cr.reshape(nctu, 4)
        pack[:, 17] = pp.merge.reshape(-1)
        a, p = ptr(pack)
        keep.append(a)
        n = lib.tpuhevc_encode_slice_data_sao(
            *ptrs, p, 1 if pp.luma_on else 0, 1 if pp.chroma_on else 0,
            fs.width, fs.height, sps.log2_ctu, sps.log2_min_cu,
            sps.log2_min_tu, sps.log2_max_tu, sps.max_tu_depth_intra,
            sps.max_tu_depth_inter, slice_type, max_merge,
            slice_type_row, qp, 1 if pps.sign_data_hiding else 0, num_ref,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
        if n < 0:
            return None
        return out[:n].tobytes()
    n = lib.tpuhevc_encode_slice_data(
        *ptrs, fs.width, fs.height, sps.log2_ctu, sps.log2_min_cu,
        sps.log2_min_tu, sps.log2_max_tu, sps.max_tu_depth_intra,
        sps.max_tu_depth_inter, slice_type, max_merge,
        slice_type_row, qp, 1 if pps.sign_data_hiding else 0, num_ref,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        return None
    return out[:n].tobytes()
