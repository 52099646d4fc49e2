"""NN-FME: weight loading parity vs the reference's hardcoded literals,
forward math checks, class<->MV mapping, and training smoke test."""

import os
import re

import numpy as np
import pytest

from tpuhevc.models import nnfme

REF_SEARCH = "/root/reference/source/Lib/TLibEncoder/TEncSearch.cpp"
CSV_ROOT = "/root/reference/DL/blowing"

_NAME_MAP = {
    "embs0": "emb0", "embs1": "emb1", "in_h1": "w1", "h1_h2": "w2",
    "h2_out": "wout", "b1": "b1", "b2": "b2", "bout": "bout",
    "BN_gamma_in": "bn_in", "BN_gamma_1": "bn1_w", "BN_beta_1": "bn1_b",
    "BN_gamma_2": "bn2_w", "BN_beta_2": "bn2_b", "mean": "mean",
    "stdev": "std",
}
_SHAPES = {
    "emb0": (8, 4), "emb1": (8, 4), "w1": (22, 17), "w2": (20, 22),
    "wout": (49, 20), "b1": (22,), "b2": (20,), "bout": (49,),
    "bn_in": (9,), "bn1_w": (22,), "bn1_b": (22,), "bn2_w": (20,),
    "bn2_b": (20,), "mean": (9,), "std": (9,),
}


def _parse_hardcoded(qp: int) -> dict:
    """Extract the reference's per-QP weight literals (verification only)."""
    src = open(REF_SEARCH).read()
    if qp == 22:
        m = re.search(r"else \{ // QP=22", src) or re.search(
            r"else\s*\{[^{]*?embs0", src, re.S)
        start = m.start()
    else:
        start = src.index(f"getQP() == {qp}")
    out = {}
    pos = start
    for cpp_name in ("embs0", "embs1", "in_h1", "h1_h2", "h2_out", "b1",
                     "b2", "bout", "BN_gamma_in", "BN_gamma_1", "BN_beta_1",
                     "BN_gamma_2", "BN_beta_2", "mean", "stdev"):
        i = src.index(cpp_name + " <<", pos)
        j = src.index(";", i)
        vals = [float(x) for x in re.split(r"[,\s]+", src[i + len(cpp_name) + 3 : j].strip()) if x]
        key = _NAME_MAP[cpp_name]
        out[key] = np.array(vals, dtype=np.float32).reshape(_SHAPES[key])
    return out


needs_ref = pytest.mark.skipif(
    not os.path.exists(REF_SEARCH), reason="reference mount not present")


@needs_ref
@pytest.mark.parametrize("qp", [22, 27, 32, 37])
def test_csv_weights_match_hardcoded(qp):
    csv = nnfme.load_csv_weights(os.path.join(CSV_ROOT, str(qp)))
    hard = _parse_hardcoded(qp)
    for k in _SHAPES:
        assert csv[k].shape == _SHAPES[k], (k, csv[k].shape)
        np.testing.assert_allclose(csv[k], hard[k], rtol=1e-5, atol=1e-6,
                                   err_msg=f"qp{qp} {k}")


def test_class_mv_mapping_roundtrip():
    for c in range(49):
        qx, qy = nnfme.CLASS_TO_QMV[c]
        assert nnfme.qmv_to_class(qx, qy) == c
    assert (nnfme.CLASS_TO_QMV[24] == [0, 0]).all()
    # half/quarter split matches the reference decode table rows
    half, qtr = nnfme.split_half_quarter(np.arange(-3, 4))
    assert list(half) == [-1, -1, 0, 0, 0, 1, 1]
    assert list(qtr) == [-1, 0, -1, 0, 1, 0, 1]


@needs_ref
def test_forward_jax_matches_np():
    import jax.numpy as jnp

    p = nnfme.load_csv_weights(os.path.join(CSV_ROOT, "22"))
    rng = np.random.default_rng(0)
    sads = rng.integers(0, 200000, size=(64, 9)).astype(np.float32)
    hs = rng.choice([4, 8, 12, 16, 24, 32, 64], size=64)
    ws = rng.choice([4, 8, 12, 16, 24, 32, 64], size=64)
    ln = nnfme.forward_np(p, sads, hs, ws)
    pj = {k: jnp.asarray(v) for k, v in p.items()}
    lj = np.asarray(nnfme.forward(
        pj, jnp.asarray(sads), jnp.asarray(nnfme.height_category(hs)),
        jnp.asarray(nnfme.width_category(ws))))
    np.testing.assert_allclose(ln, lj, rtol=2e-5, atol=2e-4)


@needs_ref
def test_embedding_category_quirk():
    # height and width switches order 12/16 differently (TEncSearch.cpp:93-113)
    assert nnfme.height_category(16) == 3 and nnfme.height_category(12) == 4
    assert nnfme.width_category(12) == 3 and nnfme.width_category(16) == 4


def test_train_fme_smoke():
    # tiny synthetic problem: the class is recoverable from the SAD surface
    rng = np.random.default_rng(1)
    n = 600
    labels = rng.integers(0, 49, size=n)
    qmv = nnfme.CLASS_TO_QMV[labels].astype(np.float32)
    base = rng.uniform(1e3, 1e5, size=(n, 1)).astype(np.float32)
    offsets = np.array([(-1, -1), (0, -1), (1, -1), (-1, 0), (0, 0), (1, 0),
                        (-1, 1), (0, 1), (1, 1)], dtype=np.float32)
    # SAD grows with distance from the true subpel position
    d = ((offsets[None, :, 0] * 4 - qmv[:, None, 0]) ** 2
         + (offsets[None, :, 1] * 4 - qmv[:, None, 1]) ** 2)
    sads = base * (1 + 0.05 * d) + rng.normal(0, base * 0.01, (n, 9))
    hs = rng.choice([8, 16, 32], size=n)
    ws = rng.choice([8, 16, 32], size=n)
    cfg = nnfme.TrainConfig(epochs=60, batch_size=256, seed=0)
    params, acc = nnfme.train_fme(sads, labels, hs, ws, cfg)
    assert set(params) == set(nnfme.PARAM_KEYS)
    # far better than chance (1/49 ~ 2%)
    assert acc > 0.25, acc


def test_extract_train_encode_loop(tmp_path):
    """Dataset extraction -> JAX training -> encoder inference round trip
    (the reference's DL/Extract_data.sh + NN_training.ipynb + NN_pred
    pipeline, SURVEY.md §2.4/§3.5)."""
    import numpy as np

    from tools.extract_fme_dataset import extract
    from tools.make_test_clip import make_clip
    from tpuhevc.models import nnfme

    w, h, n = 128, 64, 6
    raw = make_clip(w, h, n)
    fsz = w * h * 3 // 2
    frames = []
    for i in range(n):
        b = np.frombuffer(raw[i * fsz : (i + 1) * fsz], np.uint8)
        frames.append((b[: w * h].reshape(h, w),
                       b[w * h : w * h * 5 // 4].reshape(h // 2, w // 2),
                       b[w * h * 5 // 4 :].reshape(h // 2, w // 2)))
    sads, dims, labels = extract(frames, 32, sr=8)
    assert sads.shape[1] == 9 and labels.min() >= 0 and labels.max() < 49
    cfg = nnfme.TrainConfig(epochs=8, batch_size=64)
    params, acc = nnfme.train_fme(sads.astype(np.float32), labels,
                                  dims[:, 1], dims[:, 0], cfg)
    # trained params drive the exact inference path
    off = nnfme.predict_np(params, sads[:8].astype(np.float32),
                           np.full(8, 16), np.full(8, 16))
    assert off.shape == (8, 2) and np.abs(off).max() <= 3
    nnfme.save_npz(str(tmp_path / "w.npz"), {32: params})
    loaded = nnfme.select_qp_params(
        nnfme.load_npz(str(tmp_path / "w.npz")), 32)
    off2 = nnfme.predict_np(loaded, sads[:8].astype(np.float32),
                            np.full(8, 16), np.full(8, 16))
    assert np.array_equal(off, off2)


def test_dctif_beats_integer_rd():
    """The DCT-IF A/B arm (xPatternSearchFracDIF equivalent) must improve
    RD over integer-only MVs."""
    import numpy as np

    from tools.make_test_clip import make_clip
    from tpuhevc.codec.decoder import decode_stream
    from tpuhevc.codec.encoder import encode_sequence
    from tpuhevc.codec.params import EncoderConfig, SeqParams

    w, h, n = 128, 64, 5
    raw = make_clip(w, h, n, seed=3)
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

    out = {}
    for mode in ("none", "dctif"):
        cfg = EncoderConfig(
            sps=SeqParams(width=w, height=h, max_tu_depth_intra=0),
            qp=32, intra_period=-1, fme_mode=mode, inter_backend="np")
        enc, _ = encode_sequence(R(), cfg, max_frames=n)
        assert all(f.md5_ok for f in decode_stream(enc.bitstream()))
        out[mode] = (sum(r.bits for r in enc.results[1:]),
                     np.mean([r.psnr_y for r in enc.results[1:]]))
    assert out["dctif"][1] >= out["none"][1] - 0.05  # PSNR not worse
    assert out["dctif"][0] < out["none"][0] * 1.02   # bits not blown up
