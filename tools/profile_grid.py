"""Per-stage device-time breakdown of the v3 LD-P grid path.

Times each stage closure of inter_grid.build_ldp_grid_scan standalone
(the closures are stashed in inter_grid._PROBES at build time — jit is
lazy, so registering costs nothing and no full-scan compile is needed).
Each probe runs the stage inside a lax.fori_loop with an
iteration-dependent perturbation (prevents loop-invariant hoisting) and
reduces every output leaf into the carry (prevents DCE); per the
measured tunnel behavior only whole wall times of repeated loops are
trustworthy, so cost = wall(jit(loop_N)) / N after a warmup call.

Writes results/profile_grid.json and prints a table with the per-frame
roll-up (stage cost x calls/frame) next to the measured frame_step
total. Usage: python tools/profile_grid.py [--size WxH] [--iters N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="416x240")
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    w, h = map(int, args.size.split("x"))
    iters = args.iters

    import dataclasses

    import jax
    import jax.numpy as jnp

    from tpuhevc.codec import inter_grid
    from tpuhevc.codec.encoder import Encoder
    from tpuhevc.config.options import build_config, parse_cfg_file

    opts = parse_cfg_file(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "cfg", "encoder_lowdelay_P_main.cfg"))
    opts.update(SourceWidth=str(w), SourceHeight=str(h))
    cfg, _ = build_config(opts)
    cfg.sps.max_tu_depth_intra = 0
    cfg = dataclasses.replace(
        cfg, qp=32, intra_period=-1, fme_mode="nn", inter_backend="jax",
        hash_type="checksum", fetch_recon=False, num_ref_frames=4)
    enc = Encoder(cfg)
    qps = sorted({min(max(cfg.qp + o, 0), 51)
                  for o in (tuple(cfg.gop_qp_offsets) or (0,))})
    nn_by_qp = {qp: enc._nn_for_qp(qp) for qp in qps}
    inter_grid.build_ldp_grid_scan(cfg, nn_by_qp, 2)
    P = dict(inter_grid._PROBES)
    meta = P["meta"]
    W, H = meta["W"], meta["H"]
    Hc, Wc = meta["Hc"], meta["Wc"]
    R, R2, nc = meta["R"], meta["R2"], meta["nc"]
    qp = meta["qps"][0]
    tabs = meta["tabs_by_qp"][qp]
    HmL, WmL, HmC, WmC = (meta[k] for k in ("HmL", "WmL", "HmC", "WmC"))

    rng = np.random.default_rng(7)

    def rnd(shape, dtype=np.int32, lo=0, hi=255):
        return jnp.asarray(rng.integers(lo, hi, shape).astype(dtype))

    oy = rnd((H, W))
    ouv = rnd((Hc, W))
    ry = rnd((H, W))
    ry_stack = rnd((R, H, W))
    ruv_stack = rnd((R, Hc, W))
    oy2 = rnd((H // 2, W // 2), np.int16)
    ry2p = rnd((H // 2 + 2 * R2, W // 2 + 2 * R2), np.int16)
    planes_y = rnd((R, 4, 4, HmL, WmL), np.int16)
    pl_u = rnd((R, 8, 8, HmC, WmC), np.int16)
    pl_v = rnd((R, 8, 8, HmC, WmC), np.int16)
    lam = jnp.float32(60.0)
    lam_me_f = jnp.float32(8.0)
    lam_me = 2048

    nh16, nw16 = H // 16, W // 16
    nh8, nw8 = H // 8, W // 8
    nh32, nw32 = H // 32, W // 32
    h8, w8 = H // 8, W // 8

    def grids(nbh, nbw):
        mv = jnp.asarray(rng.integers(-8, 8, (nbh, nbw, 2)) * 4,
                         jnp.int32)
        ref = jnp.asarray(rng.integers(0, R, (nbh, nbw)), jnp.int32)
        return mv, ref

    mv16, ref16 = grids(nh16, nw16)
    mv8, ref8 = grids(nh8, nw8)
    mv32, ref32 = grids(nh32, nw32)

    def timeit(fn, arglists, pert, n=iters):
        """arglists: list of positional-arg tuples (the loop cycles
        through them); pert: index of a jnp arg to perturb with i."""

        def body(i, acc):
            s = acc
            for a in arglists:
                a = list(a)
                a[pert] = a[pert] + i.astype(a[pert].dtype) % 2
                out = fn(*a)
                for leaf in jax.tree_util.tree_leaves(out):
                    if hasattr(leaf, "dtype"):
                        s = s + jnp.sum(leaf).astype(jnp.float32)
            return s

        f = jax.jit(lambda: jax.lax.fori_loop(0, n, body,
                                              jnp.float32(0)))
        f().block_until_ready()  # compile + warmup
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            f().block_until_ready()
            best = min(best, (time.time() - t0) / n / len(arglists))
        return best * 1000.0  # ms per single call

    results = {}
    calls = {}

    def probe(name, fn, arglists, pert, per_frame):
        ms = timeit(fn, arglists, pert)
        results[name] = ms
        calls[name] = per_frame
        print(f"{name:26s} {ms:8.3f} ms x{per_frame:4.1f} = "
              f"{ms * per_frame:8.3f} ms/frame", flush=True)

    gc = (jnp.int32(2), jnp.int32(1))
    ts16 = (jnp.zeros((nh16, nw16), jnp.int32),
            jnp.zeros((nh16, nw16), jnp.int32))
    ts8 = (jnp.zeros((nh8, nw8), jnp.int32),
           jnp.zeros((nh8, nw8), jnp.int32))
    ts32 = (jnp.zeros((nh32, nw32), jnp.int32),
            jnp.zeros((nh32, nw32), jnp.int32))
    cx16 = jnp.zeros(nh16 * nw16, jnp.int32)
    cx8 = jnp.zeros((nh8, nw8), jnp.int32)
    cx32 = jnp.zeros((nh32, nw32), jnp.int32)

    probe("coarse_stack", P["coarse_stack"], [(oy2, ry2p)], 0, 1)
    probe("pick_coarse",
          lambda s, sm: P["pick_coarse"](s, sm, qp, lam_me, nh16, nw16, 1),
          [(jnp.abs(rnd((nc * nc, H // 16, W // 16))),
            rnd((nc * nc, H // 16, W // 16)))], 0, 2)
    # ref0 refine: full candidate set (coarse + zero + global + temporal)
    probe("refine16_ref0",
          lambda r, o: P["refine"](r, o, cx16, cx16, 16, nh16, nw16, qp,
                                   lam_me, True, gc, ts16),
          [(ry, oy)], 0, 1)
    probe("refine8_ref0",
          lambda r, o: P["refine"](r, o, cx8, cx8, 8, nh8, nw8, qp,
                                   lam_me, True, gc, ts8),
          [(ry, oy)], 0, 1)
    probe("refine32_ref0",
          lambda r, o: P["refine"](r, o, cx32, cx32, 32, nh32, nw32, qp,
                                   lam_me, True, gc, ts32),
          [(ry, oy)], 0, 1)
    probe("refine16_extra",
          lambda r, o: P["refine"](r, o, cx16, cx16, 16, nh16, nw16, qp,
                                   lam_me, False),
          [(ry, oy)], 0, R - 1)
    probe("refine8_extra",
          lambda r, o: P["refine"](r, o, cx8, cx8, 8, nh8, nw8, qp,
                                   lam_me, False),
          [(ry, oy)], 0, R - 1)
    probe("refine32_extra",
          lambda r, o: P["refine"](r, o, cx32, cx32, 32, nh32, nw32, qp,
                                   lam_me, False),
          [(ry, oy)], 0, R - 1)
    probe("luma_planes_all", P["luma_planes_all"], [(ry_stack,)], 0, 1)
    probe("chroma_planes_all", P["chroma_planes_all"], [(ruv_stack,)],
          0, 1)
    sad9 = jnp.abs(rnd((nh16 * nw16, 9)))
    probe("nn_refine",
          lambda s: P["nn_refine"](qp, s, 16, nh16 * nw16), [(sad9,)],
          0, 3)
    probe("cand_sweep16",
          lambda o, p: P["cand_sweep"](tabs, qp, lam_me_f, o, p, mv16,
                                       ref16, 16, nh16, nw16),
          [(oy, planes_y)], 0, 1)
    probe("cand_sweep8",
          lambda o, p: P["cand_sweep"](tabs, qp, lam_me_f, o, p, mv8,
                                       ref8, 8, nh8, nw8),
          [(oy, planes_y)], 0, 1)
    probe("cand_sweep32",
          lambda o, p: P["cand_sweep"](tabs, qp, lam_me_f, o, p, mv32,
                                       ref32, 32, nh32, nw32),
          [(oy, planes_y)], 0, 1)
    probe("class_code16",
          lambda o, c: P["class_code"](qp, tabs, lam, o, c, planes_y,
                                       pl_u, pl_v, mv16, ref16, 16,
                                       nh16, nw16),
          [(oy, ouv)], 0, 1)
    probe("class_code8",
          lambda o, c: P["class_code"](qp, tabs, lam, o, c, planes_y,
                                       pl_u, pl_v, mv8, ref8, 8, nh8,
                                       nw8),
          [(oy, ouv)], 0, 1)
    probe("class_code32",
          lambda o, c: P["class_code"](qp, tabs, lam, o, c, planes_y,
                                       pl_u, pl_v, mv32, ref32, 32,
                                       nh32, nw32),
          [(oy, ouv)], 0, 1)
    coef = rnd((H, W), np.int32, -600, 600)
    probe("rdoq_plane",
          lambda c: P["rdoq_plane"](c, qp, 4, lam, tabs["est_y"][4]),
          [(coef,)], 0, 4.5)
    probe("sbh_plane",
          lambda c: P["sbh_plane"](c, P["ideal_plane"](coef, qp, 4)),
          [(jnp.clip(coef // 64, -127, 127),)], 0, 4.5)
    log2_map = jnp.full((h8, w8), 4, jnp.int8)
    mv_map = jnp.asarray(rng.integers(-32, 32, (h8, w8, 2)), jnp.int32)
    ref_map = jnp.asarray(rng.integers(0, R, (h8, w8)), jnp.int32)
    cbf_cells = rnd((h8, w8), np.int32, 0, 2) > 0
    probe("deblock_device",
          lambda y, uv: P["deblock_device"](y, uv, log2_map, mv_map,
                                            ref_map, cbf_cells, qp),
          [(oy, ruv_stack[0])], 0, 1)
    probe("sao_device",
          lambda o, c, r, rc: P["sao_device"](o, c, r, rc, lam, qp),
          [(oy, ouv, ry, ruv_stack[0])], 0, 1)

    rollup = sum(results[k] * calls[k] for k in results)
    fu8 = jnp.asarray(rng.integers(0, 255, (W * H * 3 // 2,)), jnp.uint8)
    mv16p = jnp.zeros((nh16 * nw16, 2), jnp.int32)
    print(f"{'ROLLUP':26s} {rollup:8.3f} ms/frame (sum of stages)",
          flush=True)
    hc16, wc16 = (H // 8 + 1) // 2, (W // 8 + 1) // 2
    col0 = (jnp.zeros((hc16, wc16, 2), jnp.int32),
            jnp.zeros((hc16, wc16), jnp.int32))
    probe("frame_step",
          lambda f: P["frame_step"]((ry_stack, ruv_stack, mv16p, *col0),
                                    f, jnp.int32(4), 0)[1],
          [(fu8,)], 0, 1)

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "profile_grid.json")
    with open(out, "w") as f:
        json.dump(dict(size=f"{w}x{h}", iters=iters,
                       stage_ms=results, calls_per_frame=calls,
                       rollup_ms=rollup,
                       frame_step_ms=results.get("frame_step")),
                  f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
