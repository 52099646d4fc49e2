"""Device mesh construction + sharded building blocks.

- make_mesh: 1-D or 2-D logical mesh over available devices
- dp_shard: NamedSharding for batch-leading arrays (data parallelism)
- tile_prescreen: CTU-row-stripe-sharded intra SATD prescreen with a
  ppermute halo exchange for the top reference row (the pattern that scales
  the per-frame analysis across chips; deblock/SAO/ME windows use the same
  halo machinery)
"""

from __future__ import annotations

import numpy as np


def make_mesh(n_devices: int | None = None, axis: str = "tile"):
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    n = n_devices or len(devs)
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n]), (axis,))


def dp_shard(mesh, axis: str = "tile"):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(axis))


def tile_prescreen(mesh, height: int, width: int, bit_depth: int = 8):
    """Returns a jitted fn: luma plane (H, W) int32 -> (H/8, W/8) best mode
    + cost via open-loop 35-mode SATD, row-stripe sharded over the mesh with
    a halo exchange for each stripe's top boundary row.

    H must be divisible by 8 * mesh size. This is the phase-A analysis
    pattern (SURVEY.md §7 step 8): compute rides the stripes, the one-row
    halo rides ICI via ppermute.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    from ..ops.cost import hadamard
    from ..ops.intra import predict_all_modes

    (axis,) = mesh.axis_names
    n = mesh.devices.size
    assert height % (8 * n) == 0, (height, n)
    mid = 1 << (bit_depth - 1)
    h8m = None

    def local(plane):  # (H/n, W)
        hl, w = plane.shape
        nblk = (hl // 8) * (w // 8)
        # halo: last row of the stripe above (device i-1 -> i)
        perm = [(i, i + 1) for i in range(n - 1)]
        halo = jax.lax.ppermute(plane[-1:, :], axis, perm)  # (1, W)
        first = jax.lax.axis_index(axis) == 0
        halo = jnp.where(first, jnp.full_like(halo, mid), halo)
        padded = jnp.concatenate([halo, plane], axis=0)  # (H/n + 1, W)

        # per-8x8-block refs from ORIGINAL pixels (open-loop prescreen)
        yy = jnp.arange(hl // 8) * 8
        xx = jnp.arange(w // 8) * 8
        by, bx = jnp.meshgrid(yy, xx, indexing="ij")
        by = by.reshape(-1)
        bx = bx.reshape(-1)

        flat = jnp.concatenate([padded.reshape(-1), jnp.array([mid], jnp.int32)])
        wpad = w

        def seg_idx(y, x):  # top 17 and left 17 sample indices (clamped)
            tops = [(y) * wpad + jnp.clip(x - 1 + i, 0, w - 1) for i in range(17)]
            lefts = [(jnp.clip(y + i, 0, hl) ) * wpad + jnp.clip(x - 1, 0, w - 1)
                     for i in range(17)]
            return jnp.stack(tops, -1), jnp.stack(lefts, -1)

        # +1 row offset because of the halo row at the top of `padded`
        t_idx, l_idx = seg_idx(by, bx)  # by is already +0 => halo row = by
        top = flat[t_idx]
        left = flat[l_idx]
        # boundary fallback: blocks at x==0 take mid-gray left refs
        # (open-loop prescreen: advisory costs, not normative prediction)
        left = jnp.where((bx == 0)[:, None], mid, left)
        preds = predict_all_modes(top, left, 8, True, bit_depth)
        blocks = padded[1:, :].reshape(hl // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
        blocks = blocks.reshape(-1, 1, 8, 8)
        hm = jnp.asarray(hadamard(8))
        sat = (jnp.abs(hm @ (blocks - preds) @ hm.T).sum(axis=(-1, -2)) + 2) >> 2
        best = jnp.argmin(sat, axis=-1)
        cost = jnp.min(sat, axis=-1)
        return (best.reshape(hl // 8, w // 8), cost.reshape(hl // 8, w // 8))

    fn = shard_map(
        local, mesh=mesh,
        in_specs=P(axis, None),
        out_specs=(P(axis, None), P(axis, None)),
    )
    return jax.jit(fn)


def sharded_frame_step(cfg, nn_by_qp, mesh):
    """The COMPLETE grid-encoder frame step — multi-ref ME, merge jump-
    flood sweeps, intra prescreen, residual class coding, deblock/SAO,
    reconstruction — jitted with the picture state row-stripe-sharded
    over the mesh. XLA's SPMD partitioner (GSPMD) turns every cross-
    stripe reach (the sweep's jnp.roll, deblock taps, ME window gathers)
    into halo collectives automatically, so the sharded step computes
    the SAME function as the single-device one: bit-exact by
    construction, asserted in tests/test_parallel.py. This is the
    anchor-cfg encoder's per-frame analysis scaled across chips the
    idiomatic pjit way (vs the reference's host-thread frame
    parallelism, SURVEY.md §2.5).

    Returns (sharded_fn, single_fn, meta); both map
      (ry_stack (R,H,W) i32, ruv_stack (R,Hc,2Wc) i32,
       seed16 (n16,2) i32, fu8 (H*W*3//2,) u8, navail i32)
      -> (new_ry, new_ruv, seed16', packed u8).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..codec import inter_grid

    inter_grid.build_ldp_grid_scan(cfg, nn_by_qp, 1)
    step = inter_grid._PROBES["frame_step"]
    meta = inter_grid._PROBES["meta"]

    (axis,) = mesh.axis_names
    stripe = NamedSharding(mesh, P(None, axis, None))
    repl = NamedSharding(mesh, P())

    def one(ry_stack, ruv_stack, seed16, fu8, navail):
        import jax.numpy as jnp

        H = meta["H"]
        W = meta["W"]
        hc16, wc16 = (H // 8 + 1) // 2, (W // 8 + 1) // 2
        col0 = (jnp.zeros((hc16, wc16, 2), jnp.int32),
                jnp.zeros((hc16, wc16), jnp.int32))
        (ry2, ruv2, seed2, *_), packed = step(
            (ry_stack, ruv_stack, seed16, *col0), fu8, navail, 0)
        return ry2, ruv2, seed2, packed

    sharded = jax.jit(one,
                      in_shardings=(stripe, stripe, repl, repl, repl),
                      out_shardings=(stripe, stripe, repl, repl))
    single = jax.jit(one,
                     in_shardings=(repl, repl, repl, repl, repl),
                     out_shardings=(repl, repl, repl, repl))
    return sharded, single, meta


def stripe_refine(cfg, nn_by_qp, mesh):
    """CTU-row-stripe sharding of the v3 grid path's full-pel ME refine —
    the dominant per-frame analysis stage of the bench path
    (inter_grid.build_ldp_grid_scan's `refine`), run as a shard_map over
    row stripes with a ppermute halo exchange for the reference rows
    each stripe's search windows reach into.

    Returns (sharded_fn, single_fn, halo): both take
    (oy (H, W) int32, ry (H, W) int32, cx4, cy4 (nh16, nw16) int32) and
    return (mv (n16, 2), sad9 (n16, 9), cost (n16,)); the sharded one is
    bit-exact to the single-device one whenever the stripe height covers
    the halo (asserted at build). Counterpart of the reference's
    frame-parallel motion estimation split (SURVEY.md §2.5) re-expressed
    as SPMD row stripes over the mesh.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..codec import inter_grid

    from ..codec.params import p_frame_lambda

    inter_grid.build_ldp_grid_scan(cfg, nn_by_qp, 1)
    refine = inter_grid._PROBES["refine"]
    meta = inter_grid._PROBES["meta"]
    H, W, sr = meta["H"], meta["W"], meta["sr"]
    qp = meta["qps"][0]
    lam_me = int(round(np.sqrt(p_frame_lambda(cfg, 0, qp)) * 256))

    (axis,) = mesh.axis_names
    n = mesh.devices.size
    hs = H // n
    assert H % (16 * n) == 0, "H must split into 16-aligned row stripes"
    # reference reach below/above a block row: coarse center (<= sr) +
    # window margin + block size; exactness needs the halo inside the
    # neighbor stripe
    halo = sr + 24
    assert hs >= halo, f"stripe {hs} rows must cover the {halo}-row halo"
    fwd = [(d, d + 1) for d in range(n - 1)]
    bwd = [(d + 1, d) for d in range(n - 1)]

    def local(oy_s, ry_s, cx4_s, cy4_s):
        i = jax.lax.axis_index(axis)
        up = jax.lax.ppermute(ry_s[-halo:], axis, fwd)
        dn = jax.lax.ppermute(ry_s[:halo], axis, bwd)
        # frame-edge stripes replicate their own edge row: identical to
        # the single-device clip-to-frame-edge gather semantics
        up = jnp.where(i > 0, up, jnp.broadcast_to(ry_s[:1], (halo, W)))
        dn = jnp.where(i < n - 1, dn,
                       jnp.broadcast_to(ry_s[-1:], (halo, W)))
        ry_loc = jnp.concatenate([up, ry_s, dn])
        mv, sad9, cost = refine(ry_loc, oy_s, cx4_s, cy4_s, 16,
                                hs // 16, W // 16, qp, lam_me,
                                ry_y0=halo)
        return mv, sad9, cost

    sharded = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis))))

    def single(oy, ry, cx4, cy4):
        return refine(ry, oy, cx4, cy4, 16, H // 16, W // 16, qp, lam_me)

    return sharded, jax.jit(single), halo
