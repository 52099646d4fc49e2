import numpy as np

from tpuhevc.ops import interp


def test_integer_mv_is_copy():
    rng = np.random.default_rng(0)
    plane = rng.integers(0, 256, (64, 96)).astype(np.int32)
    xs = np.array([8, 16, 40])
    ys = np.array([8, 24, 16])
    mvs = np.array([[4, -8], [0, 0], [-4, 4]])  # quarter-pel, integer phases
    pred = interp.mc_np(plane, xs, ys, mvs, 16, True)
    for i in range(3):
        x = xs[i] + mvs[i, 0] // 4
        y = ys[i] + mvs[i, 1] // 4
        assert (pred[i] == plane[y : y + 16, x : x + 16]).all()


def test_constant_plane_invariant():
    plane = np.full((64, 64), 137, dtype=np.int32)
    xs = np.array([16])
    ys = np.array([16])
    for fx in range(4):
        for fy in range(4):
            pred = interp.mc_np(plane, xs, ys, np.array([[fx, fy]]), 8, True)
            assert (pred == 137).all(), (fx, fy)
    for f in range(8):
        pred = interp.mc_np(plane, xs, ys, np.array([[f, f]]), 4, False)
        assert (pred == 137).all(), f


def test_edge_clamping():
    # MV pointing outside the picture must use edge-padded samples
    plane = np.arange(32 * 32).reshape(32, 32).astype(np.int32) % 256
    pred = interp.mc_np(plane, np.array([0]), np.array([0]),
                        np.array([[-64, -64]]), 8, True)
    assert (pred == plane[0, 0]).all()


def test_jax_matches_np():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    plane = rng.integers(0, 256, (80, 120)).astype(np.int32)
    n = 40
    xs = rng.integers(-4, 110, n)
    ys = rng.integers(-4, 70, n)
    mvs = rng.integers(-40, 40, (n, 2))
    for size, is_luma in ((16, True), (8, True), (8, False), (4, False)):
        ref = interp.mc_np(plane, xs, ys, mvs, size, is_luma)
        got = np.asarray(interp.mc(
            jnp.asarray(plane), jnp.asarray(xs), jnp.asarray(ys),
            jnp.asarray(mvs), size, is_luma))
        assert (ref == got).all(), (size, is_luma)


def test_half_pel_symmetry():
    # the half-pel filter is symmetric: mirroring the input mirrors output
    rng = np.random.default_rng(2)
    plane = rng.integers(0, 256, (48, 48)).astype(np.int32)
    mirrored = plane[:, ::-1].copy()
    p1 = interp.mc_np(plane, np.array([16]), np.array([16]),
                      np.array([[2, 0]]), 8, True)
    # block at mirrored x: x + 8 samples map to 48-1-(x..x+7) reversed;
    # half-pel grid between samples shifts by one
    x2 = 48 - 16 - 8 - 1
    p2 = interp.mc_np(mirrored, np.array([x2]), np.array([16]),
                      np.array([[2, 0]]), 8, True)
    assert (p1 == p2[:, :, ::-1]).all()
