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
        ctypes.POINTER(ctypes.c_int32)] * 11 + [ctypes.c_int] * 13 + [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    _LIB = lib
    return _LIB


def encode_slice_data_native(fs, sps, pps, slice_type_row: int, qp: int,
                             slice_type: int = 2, max_merge: int = 5) -> bytes | None:
    """Full slice-data payload (CABAC bytes + rbsp trailing), or None if
    the native library is unavailable. slice_type: 2 = I, 1 = P."""
    lib = get_lib()
    if lib is None:
        return None

    def ptr(a):
        a = np.ascontiguousarray(a, dtype=np.int32)
        return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    keep = []
    ptrs = []
    for arr in (fs.cu_log2, fs.luma_mode, fs.chroma_mode, fs.coeff_y,
                fs.coeff_cb, fs.coeff_cr, fs.skip, fs.merge_flag,
                fs.merge_idx, fs.mvp_flag, fs.mvd):
        a, p = ptr(arr)
        keep.append(a)
        ptrs.append(p)
    cap = fs.width * fs.height * 4 + 1024
    out = np.empty(cap, dtype=np.uint8)
    n = lib.tpuhevc_encode_slice_data(
        *ptrs, fs.width, fs.height, sps.log2_ctu, sps.log2_min_cu,
        sps.log2_min_tu, sps.log2_max_tu, sps.max_tu_depth_intra,
        sps.max_tu_depth_inter, slice_type, max_merge,
        slice_type_row, qp, 1 if pps.sign_data_hiding else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        return None
    return out[:n].tobytes()
