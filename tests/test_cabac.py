"""CABAC engine roundtrip: encoder bits must decode to the same bins with
identical context evolution — the encoder/decoder pair is self-consistent,
and stream termination (terminating bin + finish) parses cleanly."""

import random

from tpuhevc.entropy import bitio
from tpuhevc.entropy.cabac import (
    CabacBitEstimator,
    CabacDecoder,
    CabacEncoder,
    ContextSet,
    NUM_CTX,
)


def _finish_to_bytes(enc: CabacEncoder, trailing=True) -> bytes:
    enc.encode_bin_trm(1)
    enc.finish()
    w = bitio.BitWriter()
    w.write_bytes(bytes(enc.out))
    val, nbits = enc.pending_bits
    w.write(val, nbits)
    w.rbsp_trailing_bits()
    return w.getvalue()


def _roundtrip(seed: int, n: int, qp: int, st: int):
    rng = random.Random(seed)
    ctx_e = ContextSet(st, qp)
    enc = CabacEncoder(ctx_e)
    script = []
    for _ in range(n):
        kind = rng.randrange(10)
        if kind < 6:
            idx = rng.randrange(NUM_CTX)
            b = rng.randrange(2)
            script.append(("ctx", idx, b))
            enc.encode_bin(b, idx)
        elif kind < 8:
            b = rng.randrange(2)
            script.append(("ep", b, None))
            enc.encode_bin_ep(b)
        else:
            nb = rng.randrange(1, 20)
            v = rng.randrange(1 << nb)
            script.append(("eps", v, nb))
            enc.encode_bins_ep(v, nb)
    data = _finish_to_bytes(enc)

    ctx_d = ContextSet(st, qp)
    dec = CabacDecoder(data, ctx_d)
    for kind, a, b in script:
        if kind == "ctx":
            assert dec.decode_bin(a) == b
        elif kind == "ep":
            assert dec.decode_bin_ep() == a
        else:
            assert dec.decode_bins_ep(b) == a
    assert dec.decode_bin_trm() == 1
    # context banks must evolve identically
    assert ctx_e.states == ctx_d.states


def test_roundtrip_many():
    for seed in range(8):
        _roundtrip(seed, 3000, qp=22 + 5 * (seed % 4), st=seed % 3)


def test_roundtrip_skewed_bins():
    # long runs of MPS stress the carry/renorm paths
    ctx = ContextSet(2, 32)
    enc = CabacEncoder(ctx)
    for i in range(5000):
        enc.encode_bin(0 if i % 37 else 1, 5)
    data = _finish_to_bytes(enc)
    ctx2 = ContextSet(2, 32)
    dec = CabacDecoder(data, ctx2)
    for i in range(5000):
        assert dec.decode_bin(5) == (0 if i % 37 else 1)
    assert dec.decode_bin_trm() == 1


def test_terminating_bins_mid_stream():
    ctx = ContextSet(2, 27)
    enc = CabacEncoder(ctx)
    for i in range(100):
        enc.encode_bin(i & 1, 3)
        enc.encode_bin_trm(0)
    data = _finish_to_bytes(enc)
    ctx2 = ContextSet(2, 27)
    dec = CabacDecoder(data, ctx2)
    for i in range(100):
        assert dec.decode_bin(3) == (i & 1)
        assert dec.decode_bin_trm() == 0
    assert dec.decode_bin_trm() == 1


def test_estimator_tracks_states_like_encoder():
    rng = random.Random(9)
    ctx_e = ContextSet(1, 30)
    ctx_c = ContextSet(1, 30)
    enc = CabacEncoder(ctx_e)
    cnt = CabacBitEstimator(ctx_c)
    for _ in range(2000):
        idx = rng.randrange(NUM_CTX)
        b = rng.randrange(2)
        enc.encode_bin(b, idx)
        cnt.encode_bin(b, idx)
    assert ctx_e.states == ctx_c.states
    # estimate should be within ~2% of real bits for long streams
    data = _finish_to_bytes(enc)
    real_bits = len(data) * 8
    assert abs(cnt.bits - real_bits) / real_bits < 0.05


def test_context_init_matches_spec_formula():
    # H.265 §9.3.2.2 example: initValue=154 is the uniform state regardless
    # of QP: slope=0, offset=64+... => state 0 (p=0.5) with MPS split.
    from tpuhevc.entropy.ctx_tables import init_state

    for qp in (0, 22, 37, 51):
        s = init_state(qp, 154)
        assert s >> 1 == 0  # probability state 0
    # monotone: higher initValue slope pushes state with QP
    assert init_state(22, 107) != init_state(37, 107)
