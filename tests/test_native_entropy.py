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
