"""Mesh + sharded building blocks on the virtual 8-device CPU mesh:
tile-sharded prescreen with halo exchange, DP NN-FME training step."""

import pytest
import numpy as np

from tpuhevc.parallel.mesh import dp_shard, make_mesh, tile_prescreen


def test_mesh_has_8_cpu_devices():
    import jax

    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    assert mesh.devices.size == 8


def test_tile_prescreen_runs_and_is_stripe_invariant():
    import jax.numpy as jnp

    mesh = make_mesh(8)
    h, w = 8 * 8 * 8, 128  # 8 stripes of 8 block-rows
    rng = np.random.default_rng(0)
    plane = rng.integers(0, 256, (h, w)).astype(np.int32)
    fn = tile_prescreen(mesh, h, w)
    modes, costs = fn(jnp.asarray(plane))
    modes = np.asarray(modes)
    costs = np.asarray(costs)
    assert modes.shape == (h // 8, w // 8)
    assert (modes >= 0).all() and (modes < 35).all()
    assert (costs >= 0).all()
    # interior blocks (not on stripe boundaries) must match a 1-device run
    mesh1 = make_mesh(1)
    fn1 = tile_prescreen(mesh1, h, w)
    m1, c1 = (np.asarray(a) for a in fn1(jnp.asarray(plane)))
    stripe_rows = h // 8 // 8
    interior = np.ones(h // 8, dtype=bool)
    # last block-row of each stripe reads below-left samples past the
    # stripe (clamped locally) -> advisory-only boundary approximation
    interior[stripe_rows - 1 :: stripe_rows] = False
    assert (modes[interior] == m1[interior]).all()
    assert (costs[interior] == c1[interior]).all()


def test_dp_train_step_on_mesh():
    from tpuhevc.models import nnfme

    mesh = make_mesh(8, axis="data")
    rng = np.random.default_rng(0)
    n = 512
    sads = rng.uniform(0, 1e5, (n, 9)).astype(np.float32)
    labels = rng.integers(0, 49, n)
    hs = rng.choice([8, 16], n)
    ws = rng.choice([8, 16], n)
    cfg = nnfme.TrainConfig(epochs=2, batch_size=256)
    params, acc = nnfme.train_fme(sads, labels, hs, ws, cfg, mesh=mesh)
    assert 0.0 <= acc <= 1.0
    assert params["w1"].shape == (22, 17)


def test_segment_parallel_encoding():
    """GOP-segment parallel encoding: stitched stream decodes with every
    hash OK and matches single-device RD behavior per segment."""
    import numpy as np

    from tools.make_test_clip import make_clip
    from tpuhevc.codec.decoder import decode_stream
    from tpuhevc.codec.params import EncoderConfig, SeqParams
    from tpuhevc.parallel.segments import encode_segments_parallel

    w, h, n = 128, 64, 8
    raw = make_clip(w, h, n)
    fsz = w * h * 3 // 2
    frames = []
    for i in range(n):
        b = np.frombuffer(raw[i * fsz : (i + 1) * fsz], np.uint8)
        frames.append((b[: w * h].reshape(h, w),
                       b[w * h : w * h * 5 // 4].reshape(h // 2, w // 2),
                       b[w * h * 5 // 4 :].reshape(h // 2, w // 2)))
    cfg = EncoderConfig(sps=SeqParams(width=w, height=h,
                                      max_tu_depth_intra=0),
                        qp=32, intra_period=-1, fme_mode="none",
                        inter_backend="np")
    bs, results = encode_segments_parallel(frames, cfg, n_segments=2)
    dec = decode_stream(bs)
    assert len(dec) == n
    assert all(f.md5_ok for f in dec)


@pytest.mark.oracle
def test_segment_overlapped_encoding():
    """Overlap driver: each segment's device chunks dispatched before any
    collect blocks; stitched stream must decode with every hash OK."""
    import numpy as np

    from tools.make_test_clip import make_clip
    from tpuhevc.codec.decoder import decode_stream
    from tpuhevc.codec.params import EncoderConfig, SeqParams
    from tpuhevc.parallel.segments import encode_segments_overlapped

    w, h, n = 64, 64, 16
    raw = make_clip(w, h, n)
    fsz = w * h * 3 // 2
    frames = []
    for i in range(n):
        b = np.frombuffer(raw[i * fsz : (i + 1) * fsz], np.uint8)
        frames.append((b[: w * h].reshape(h, w),
                       b[w * h : w * h * 5 // 4].reshape(h // 2, w // 2),
                       b[w * h * 5 // 4 :].reshape(h // 2, w // 2)))
    cfg = EncoderConfig(sps=SeqParams(width=w, height=h,
                                      max_tu_depth_intra=0),
                        qp=32, intra_period=-1, fme_mode="none",
                        inter_backend="jax", num_ref_frames=1)
    bs, results = encode_segments_overlapped(frames, cfg, n_segments=2)
    dec = decode_stream(bs)
    assert len(dec) == n
    assert all(f.md5_ok for f in dec)


def test_stripe_refine_bit_exact():
    """The v3 grid path's full-pel ME refine sharded over CTU-row
    stripes (shard_map + ppermute reference halos) must match the
    single-device refine bit-exactly — including frame-edge clamping
    reproduced by edge-row halo fill."""
    import jax.numpy as jnp
    import numpy as np

    from tpuhevc.codec.params import EncoderConfig, SeqParams
    from tpuhevc.parallel.mesh import make_mesh, stripe_refine

    w, h = 128, 384  # 8 stripes x 48 rows >= the sr+24 halo
    cfg = EncoderConfig(
        sps=SeqParams(width=w, height=h, max_tu_depth_intra=0),
        qp=32, intra_period=-1, fme_mode="none", inter_backend="jax",
        num_ref_frames=1, search_range=16)
    mesh = make_mesh(8)
    sharded, single, halo = stripe_refine(cfg, {32: None}, mesh)

    rng = np.random.default_rng(7)
    oy = jnp.asarray(rng.integers(0, 256, (h, w)), jnp.int32)
    # reference = shifted original + noise so the search has structure
    ry = jnp.asarray(np.roll(np.asarray(oy), (5, -3), (0, 1))
                     + rng.integers(-4, 5, (h, w)), jnp.int32)
    nh16, nw16 = h // 16, w // 16
    cx4 = jnp.asarray(rng.integers(-4, 5, (nh16, nw16)), jnp.int32)
    cy4 = jnp.asarray(rng.integers(-4, 5, (nh16, nw16)), jnp.int32)

    mv_s, sad9_s, cost_s = sharded(oy, ry, cx4, cy4)
    mv_1, sad9_1, cost_1 = single(oy, ry, cx4, cy4)
    assert np.array_equal(np.asarray(mv_s), np.asarray(mv_1))
    assert np.array_equal(np.asarray(sad9_s), np.asarray(sad9_1))
    assert np.array_equal(np.asarray(cost_s), np.asarray(cost_1))


def test_sharded_frame_step_bit_exact():
    """The FULL grid-encoder frame step (anchor-shaped: multi-ref ME,
    merge sweeps, residual class coding, deblock, recon) jitted with the
    picture state row-stripe-sharded over the 8-device mesh must equal
    the replicated single-device run bit-exactly — GSPMD inserts the
    halo collectives; the math is unchanged."""
    import jax.numpy as jnp
    import numpy as np

    from tpuhevc.codec.params import EncoderConfig, SeqParams
    from tpuhevc.parallel.mesh import make_mesh, sharded_frame_step

    W, H = 128, 128
    cfg = EncoderConfig(
        sps=SeqParams(width=W, height=H, max_tu_depth_intra=0),
        qp=32, intra_period=-1, fme_mode="none", inter_backend="jax",
        num_ref_frames=2, search_range=16, deblocking=True)
    mesh = make_mesh(8)
    sharded, single, meta = sharded_frame_step(cfg, {32: None}, mesh)

    R, Hc, Wc = meta["R"], meta["Hc"], meta["Wc"]
    rng = np.random.default_rng(3)
    oy = rng.integers(0, 256, (H, W), dtype=np.uint8)
    ry = jnp.asarray(np.broadcast_to(
        np.roll(oy, (3, -2), (0, 1)).astype(np.int32), (R, H, W)))
    ruv = jnp.asarray(rng.integers(0, 256, (R, Hc, 2 * Wc)), jnp.int32)
    n16 = (H // 16) * (W // 16)
    seed = jnp.zeros((n16, 2), jnp.int32)
    fu8 = jnp.asarray(np.concatenate([
        oy.ravel(),
        rng.integers(0, 256, (H * W // 4,), dtype=np.uint8),
        rng.integers(0, 256, (H * W // 4,), dtype=np.uint8)]))
    na = jnp.int32(R)
    out_s = sharded(ry, ruv, seed, fu8, na)
    out_1 = single(ry, ruv, seed, fu8, na)
    for a, b in zip(out_s, out_1):
        assert np.array_equal(np.asarray(a), np.asarray(b))
