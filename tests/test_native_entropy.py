"""Native C++ entropy encoder must be byte-identical to the Python
reference across random frames, QPs, and geometries."""

import numpy as np
import pytest

from tpuhevc.codec.params import PicParams, SeqParams
from tpuhevc.entropy import bitio
from tpuhevc.entropy.cabac import CabacEncoder, ContextSet
from tpuhevc.entropy.native import encode_slice_data_native, get_lib
from tpuhevc.entropy.syntax import encode_slice_data

from test_syntax import _random_frame

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native lib unavailable")


def _python_bytes(fs, sps, pps, qp):
    cab = CabacEncoder(ContextSet(2, qp))
    encode_slice_data(cab, fs, sps, pps)
    cab.finish()
    w = bitio.BitWriter()
    w.write_bytes(bytes(cab.out))
    val, nb = cab.pending_bits
    w.write(val, nb)
    w.rbsp_trailing_bits()
    return w.getvalue()


@pytest.mark.parametrize("seed,w,h,qp", [
    (0, 64, 64, 32), (1, 416, 240, 22), (2, 416, 240, 37),
    (3, 104, 72, 27), (4, 128, 128, 51),
])
def test_native_matches_python(seed, w, h, qp):
    rng = np.random.default_rng(seed)
    sps = SeqParams(width=w, height=h)
    pps = PicParams()
    fs = _random_frame(rng, sps.coded_width, sps.coded_height)
    py = _python_bytes(fs, sps, pps, qp)
    nat = encode_slice_data_native(fs, sps, pps, 2, qp)
    assert nat == py


def test_native_zero_frame():
    from tpuhevc.entropy.syntax import FrameSyntax

    sps = SeqParams(width=64, height=64)
    pps = PicParams()
    fs = FrameSyntax(64, 64)
    assert encode_slice_data_native(fs, sps, pps, 2, 32) == _python_bytes(
        fs, sps, pps, 32)


def _random_p_frame_v3(rng, w, h):
    """Random P frame exercising the v3 native features: rectangular
    partitions (2NxN/Nx2N at 16/32 CUs) and whole-CU intra-in-P."""
    from tpuhevc.entropy.syntax import FrameSyntax

    fs = _random_frame(rng, w, h)
    h8, w8 = h // 8, w // 8
    intra_modes = fs.luma_mode.copy()
    # inter cells read as DC for intra-MPM neighbor purposes (the walk
    # leaves luma_mode at its DC default there); only intra CUs below
    # get a real mode
    fs.luma_mode[:] = 1
    fs.inter_dir = np.ones((h8, w8), np.int32)
    fs.part_mode = np.zeros((h8, w8), np.int32)
    fs.skip = (rng.random((h8, w8)) < 0.2).astype(np.int32)
    fs.merge_flag = (rng.random((h8, w8)) < 0.3).astype(np.int32)
    fs.merge_idx = rng.integers(0, 5, (h8, w8)).astype(np.int32)
    fs.mvp_flag = rng.integers(0, 2, (h8, w8)).astype(np.int32)
    fs.mvd = rng.integers(-64, 65, (h8, w8, 2)).astype(np.int32)
    fs.ref_idx = rng.integers(0, 3, (h8, w8)).astype(np.int32)
    fs.mv = rng.integers(-128, 129, (h8, w8, 2)).astype(np.int32)
    # walk CU origins: tag some 16/32 CUs as partitioned or intra.
    # Decisions that feed neighbor contexts (skip) must be CU-uniform —
    # the python coder normalizes the maps while encoding (mark_inter),
    # so non-uniform random input would diverge from the native coder
    # even though no legal stream ever carries it.
    seen = np.zeros((h8, w8), bool)
    for y8 in range(h8):
        for x8 in range(w8):
            if seen[y8, x8]:
                continue
            lg = int(fs.cu_log2[y8, x8])
            s8 = 1 << (lg - 3)
            seen[y8 : y8 + s8, x8 : x8 + s8] = True
            fs.skip[y8 : y8 + s8, x8 : x8 + s8] = fs.skip[y8, x8]
            r = rng.random()
            if lg >= 4 and r < 0.3:
                fs.part_mode[y8, x8] = rng.integers(1, 3)
                fs.skip[y8 : y8 + s8, x8 : x8 + s8] = 0
            elif r < 0.45:  # intra CU in P: square, TU = CU
                fs.inter_dir[y8 : y8 + s8, x8 : x8 + s8] = 0
                fs.skip[y8 : y8 + s8, x8 : x8 + s8] = 0
                mode = int(intra_modes[y8, x8])
                fs.luma_mode[y8 : y8 + s8, x8 : x8 + s8] = mode
                fs.luma_mode4[2 * y8 : 2 * (y8 + s8),
                              2 * x8 : 2 * (x8 + s8)] = mode
                fs.tu_log2[2 * y8 : 2 * (y8 + s8),
                           2 * x8 : 2 * (x8 + s8)] = min(lg, 5)
    return fs


def _python_p_bytes(fs, sps, pps, qp, num_ref):
    cab = CabacEncoder(ContextSet(1, qp))
    encode_slice_data(cab, fs, sps, pps, slice_type=1, max_merge=5,
                      num_ref=num_ref)
    cab.finish()
    w = bitio.BitWriter()
    w.write_bytes(bytes(cab.out))
    val, nb = cab.pending_bits
    w.write(val, nb)
    w.rbsp_trailing_bits()
    return w.getvalue()


@pytest.mark.parametrize("seed,w,h,qp,sbh", [
    (10, 128, 64, 32, False), (11, 192, 128, 27, True),
    (12, 64, 64, 37, False),
])
def test_native_v3_parts_intra_matches_python(seed, w, h, qp, sbh):
    lib = get_lib()
    if not hasattr(lib, "tpuhevc_encode_slice_data_v3"):
        pytest.skip("native v3 unavailable")
    rng = np.random.default_rng(seed)
    sps = SeqParams(width=w, height=h)
    pps = PicParams(sign_data_hiding=sbh)
    fs = _random_p_frame_v3(rng, w, h)
    assert fs.part_mode.any() and (fs.inter_dir == 0).any()
    # native first: the python coder normalizes fs maps while encoding
    # (mark_inter mutations), the native coder treats them as const
    nat = encode_slice_data_native(fs, sps, pps, 1, qp, 1, 5, 3)
    py = _python_p_bytes(fs, sps, pps, qp, 3)
    assert nat is not None
    assert nat == py


def test_native_v5_ctx_export_matches_python():
    """v5's end-of-slice context snapshot equals the Python coder's
    final ContextSet states (the adaptive bit-estimator feedback)."""
    lib = get_lib()
    if not hasattr(lib, "tpuhevc_encode_slice_data_v5"):
        pytest.skip("native v5 unavailable")
    from tpuhevc.entropy.cabac import NUM_CTX

    rng = np.random.default_rng(7)
    sps = SeqParams(width=128, height=128)
    pps = PicParams()
    fs = _random_frame(rng, 128, 128)
    ctx = np.zeros(256, np.int32)
    nat = encode_slice_data_native(fs, sps, pps, 2, 30, ctx_out=ctx)
    cab = CabacEncoder(ContextSet(2, 30))
    encode_slice_data(cab, fs, sps, pps)
    cab.finish()
    assert nat == _python_bytes(fs, sps, pps, 30)
    assert ctx[:NUM_CTX].tolist() == cab.ctx.states
