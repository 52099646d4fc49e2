"""Per-stage wall-time breakdown of the LD-P loop (dev stage vs host)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tools.make_test_clip import make_clip
    from tpuhevc.codec.encoder import Encoder, _load_nn_params
    from tpuhevc.codec.inter_enc import (_stage_fn, _stage_collect,
                                         assemble_frame_p)
    from tpuhevc.codec.params import EncoderConfig, SeqParams
    from tpuhevc.codec.recon import _pad_to
    from tpuhevc.utils.tables import qp_to_lambda

    w, h, frames = 416, 240, 24
    raw = make_clip(w, h, frames)
    fsz = w * h * 3 // 2
    clip = []
    for i in range(frames):
        buf = np.frombuffer(raw[i * fsz : (i + 1) * fsz], dtype=np.uint8)
        clip.append((
            buf[: w * h].reshape(h, w),
            buf[w * h : w * h + w * h // 4].reshape(h // 2, w // 2),
            buf[w * h + w * h // 4 :].reshape(h // 2, w // 2),
        ))

    cfg = EncoderConfig(sps=SeqParams(width=w, height=h,
                                      max_tu_depth_intra=0),
                        qp=32, intra_period=-1, fme_mode="nn",
                        inter_backend="jax")
    enc = Encoder(cfg)
    lam = int(round(np.sqrt(qp_to_lambda(32, 0.4624)) * 256))
    fn, grids = _stage_fn(cfg, enc.nn_params, lam)

    # IDR
    enc.encode_frame(*clip[0], poc=0)
    ref = tuple(jnp.asarray(p) for p in enc.dpb_recon)

    T = dict(upload=0.0, stage=0.0, fetch=0.0, collect=0.0, assemble=0.0,
             serialize=0.0)
    # warmup
    oy = jnp.asarray(_pad_to(np.asarray(clip[1][0]), h, w))
    ou = jnp.asarray(_pad_to(np.asarray(clip[1][1]), h // 2, w // 2))
    ov = jnp.asarray(_pad_to(np.asarray(clip[1][2]), h // 2, w // 2))
    buf, ry, ru, rv = fn(oy, ou, ov, *ref)
    np.asarray(buf)

    t_all = time.time()
    for i in range(1, frames):
        y, u, v = clip[i]
        t0 = time.time()
        oy = jnp.asarray(_pad_to(np.asarray(y), h, w))
        ou = jnp.asarray(_pad_to(np.asarray(u), h // 2, w // 2))
        ov = jnp.asarray(_pad_to(np.asarray(v), h // 2, w // 2))
        jax.block_until_ready(ov)
        t1 = time.time()
        buf, ry, ru, rv = fn(oy, ou, ov, *ref)
        ref = (ry, ru, rv)
        jax.block_until_ready(buf)
        t2 = time.time()
        nbuf = np.asarray(buf)
        t3 = time.time()
        per_cu = _stage_collect(cfg, nbuf, grids)
        t4 = time.time()
        pre = assemble_frame_p(cfg, per_cu)
        t5 = time.time()
        enc.encode_frame(y, u, v, poc=i, precomputed=pre)
        t6 = time.time()
        T["upload"] += t1 - t0
        T["stage"] += t2 - t1
        T["fetch"] += t3 - t2
        T["collect"] += t4 - t3
        T["assemble"] += t5 - t4
        T["serialize"] += t6 - t5
    total = time.time() - t_all
    n = frames - 1
    for k, v in T.items():
        print(f"{k:10s} {v / n * 1000:8.2f} ms/frame")
    print(f"{'total':10s} {total / n * 1000:8.2f} ms/frame "
          f"({n / total:.2f} fps sequential)")


if __name__ == "__main__":
    main()
