import numpy as np
import pytest

from tpuhevc.ops import transforms as tx
from tpuhevc.ops import intra


def test_transform_roundtrip_identityish():
    # the HEVC integer transforms are near-orthogonal: fwd->inv reproduces
    # the residual to within a few LSBs on random noise (exactness of the
    # codec comes from encoder and decoder sharing the same inverse)
    rng = np.random.default_rng(0)
    for s in (4, 8, 16, 32):
        r = rng.integers(-255, 256, size=(20, s, s)).astype(np.int32)
        c = tx.forward_transform_np(r)
        back = tx.inverse_transform_np(c)
        err = np.abs(back - r)
        assert err.max() <= 4, (s, err.max())
        assert err.mean() < 1.0


def test_dst_roundtrip():
    rng = np.random.default_rng(1)
    r = rng.integers(-255, 256, size=(50, 4, 4)).astype(np.int32)
    c = tx.forward_transform_np(r, is_dst=True)
    back = tx.inverse_transform_np(c, is_dst=True)
    assert np.abs(back - r).max() <= 1


def test_quant_dequant_jax_matches_np():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    for log2 in (2, 3, 4, 5):
        s = 1 << log2
        c = rng.integers(-30000, 30000, size=(8, s, s)).astype(np.int32)
        for qp in (0, 22, 27, 32, 37, 51):
            q_np = tx.quantize_np(c, qp, log2)
            q_j = np.asarray(tx.quantize(jnp.asarray(c), qp, log2))
            assert (q_np == q_j).all()
            d_np = tx.dequantize_np(q_np, qp, log2)
            d_j = np.asarray(tx.dequantize(jnp.asarray(q_np), qp, log2))
            assert (d_np == d_j).all()


def test_transforms_jax_matches_np():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    for s in (4, 8, 16, 32):
        r = rng.integers(-512, 512, size=(10, s, s)).astype(np.int32)
        assert (
            np.asarray(tx.forward_transform(jnp.asarray(r)))
            == tx.forward_transform_np(r)
        ).all()
        c = tx.forward_transform_np(r)
        assert (
            np.asarray(tx.inverse_transform(jnp.asarray(c)))
            == tx.inverse_transform_np(c)
        ).all()


@pytest.mark.parametrize("size", [4, 8, 16, 32])
@pytest.mark.parametrize("is_luma", [True, False])
def test_intra_jax_matches_np(size, is_luma):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(size)
    n = 12
    tops = rng.integers(0, 256, size=(n, 2 * size + 1)).astype(np.int32)
    lefts = rng.integers(0, 256, size=(n, 2 * size + 1)).astype(np.int32)
    lefts[:, 0] = tops[:, 0]  # shared corner
    fn = jax.jit(lambda t, l: intra.predict_all_modes(t, l, size, is_luma))
    all_preds = np.asarray(fn(jnp.asarray(tops), jnp.asarray(lefts)))
    for i in range(n):
        for mode in range(35):
            ref = intra.predict_block_np(tops[i], lefts[i], mode, size, is_luma)
            got = all_preds[i, mode]
            assert (ref == got).all(), (size, is_luma, i, mode)


def test_dc_prediction_value():
    size = 8
    top = np.full(2 * size + 1, 100, dtype=np.int32)
    left = np.full(2 * size + 1, 60, dtype=np.int32)
    pred = intra.predict_np(top, left, 1, size)
    assert pred[4, 4] == (100 * 8 + 60 * 8 + 8) >> 4


def test_rdoq_improves_rd():
    """RDOQ-lite must lower the lambda-cost D + lambda*R at the anchor
    QPs (level decisions + CG zeroing; SURVEY.md §A.1)."""
    import numpy as np

    from tools.make_test_clip import make_clip
    from tpuhevc.codec.decoder import decode_stream
    from tpuhevc.codec.encoder import encode_sequence
    from tpuhevc.codec.params import EncoderConfig, SeqParams
    from tpuhevc.utils.tables import qp_to_lambda

    w, h, n = 128, 64, 5
    raw = make_clip(w, h, n)
    fsz = w * h * 3 // 2
    clip = []
    for i in range(n):
        b = np.frombuffer(raw[i * fsz : (i + 1) * fsz], np.uint8)
        clip.append((b[: w * h].reshape(h, w),
                     b[w * h : w * h * 5 // 4].reshape(h // 2, w // 2),
                     b[w * h * 5 // 4 :].reshape(h // 2, w // 2)))

    class R:
        def read_frame(self, i):
            return clip[i] if i < len(clip) else None

    for qp in (27, 32):
        costs = {}
        for rdoq in (False, True):
            cfg = EncoderConfig(
                sps=SeqParams(width=w, height=h, max_tu_depth_intra=0),
                qp=qp, intra_period=-1, fme_mode="none",
                inter_backend="np", rdoq=rdoq)
            enc, _ = encode_sequence(R(), cfg, max_frames=n)
            assert all(f.md5_ok for f in decode_stream(enc.bitstream()))
            bits = sum(r.bits for r in enc.results[1:])
            py = float(np.mean([r.psnr_y for r in enc.results[1:]]))
            mse = 255 ** 2 / 10 ** (py / 10)
            costs[rdoq] = mse * w * h * (n - 1) + qp_to_lambda(
                qp, 0.4624) * bits
        assert costs[True] < costs[False] * 1.01, (qp, costs)
