"""NN-FME: per-QP MLP that predicts the fractional-pel MV refinement from
the 3x3 integer-pel SAD surface + PU dimensions.

Inference contract reproduces the reference's NN_pred() arithmetic exactly
(TEncSearch.cpp:85-204): 9 SADs z-normalized by the dataset mapper then
scaled by the input-BN weight (no bias — reference quirk), two 8x4
categorical embeddings with the reference's height/width row orders
(TEncSearch.cpp:93-113, note height and width use DIFFERENT orders for
12/16), concat -> 17 -> Linear+ReLU+affine -> 22 -> 20 -> Linear -> 49
logits -> argmax -> quarter-pel (dx, dy) in [-3, 3].

Weights load from the reference's DL/<seq>/<qp>/*.csv exports or from our
own .npz; training (train_fme) reproduces the FastAI tabular learner in
JAX/optax and exports runtime-foldable params (BN running stats folded so
the inference formula above is exact).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

import numpy as np

# class index -> quarter-pel offsets: class = (qy+3)*7 + (qx+3)
# (TEncSearch.cpp:136-193; label construction comment at 4568-4579)
CLASS_TO_QMV = np.array(
    [[(c % 7) - 3, (c // 7) - 3] for c in range(49)], dtype=np.int32
)


def qmv_to_class(qx: int, qy: int) -> int:
    return (qy + 3) * 7 + (qx + 3)


def split_half_quarter(q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Quarter-pel offset -> (half, quarter) with trunc-toward-zero division
    (matches the reference's decode table)."""
    half = np.fix(q / 2).astype(np.int32)
    return half, (q - 2 * half).astype(np.int32)


# category row orders (TEncSearch.cpp:93-113): index = row in emb matrix
_HEIGHT_ROWS = {4: 1, 8: 2, 16: 3, 12: 4, 24: 5, 32: 6, 64: 7}
_WIDTH_ROWS = {4: 1, 8: 2, 12: 3, 16: 4, 24: 5, 32: 6, 64: 7}


def height_category(h) -> np.ndarray:
    h = np.asarray(h)
    out = np.zeros(h.shape, dtype=np.int32)
    for k, v in _HEIGHT_ROWS.items():
        out = np.where(h == k, v, out)
    return out


def width_category(w) -> np.ndarray:
    w = np.asarray(w)
    out = np.zeros(w.shape, dtype=np.int32)
    for k, v in _WIDTH_ROWS.items():
        out = np.where(w == k, v, out)
    return out


PARAM_KEYS = (
    "emb0", "emb1", "w1", "b1", "w2", "b2", "wout", "bout",
    "bn_in", "bn1_w", "bn1_b", "bn2_w", "bn2_b", "mean", "std",
)


def _read_csv_matrix(path: str) -> np.ndarray:
    rows = []
    with open(path) as f:
        for line in f:
            vals = [x for x in re.split(r"[,;\s]+", line.strip()) if x]
            if vals:
                rows.append([float(x) for x in vals])
    return np.array(rows, dtype=np.float32)


def load_csv_weights(qp_dir: str) -> dict[str, np.ndarray]:
    """Load one QP's weights from a reference-format CSV export directory
    (files like 1.emb0-weight.csv ... 14.mapper_XX.csv)."""
    files = {f.split(".", 1)[1]: os.path.join(qp_dir, f)
             for f in os.listdir(qp_dir) if f.endswith(".csv")}

    def get(tag):
        for name, path in files.items():
            if name.startswith(tag):
                return _read_csv_matrix(path)
        raise FileNotFoundError(f"{tag} in {qp_dir}")

    mapper = get("mapper")  # rows: mean, std (9 each) in some layout
    mean, std = mapper[0], mapper[1]
    p = {
        "emb0": get("emb0-weight"),
        "emb1": get("emb1-weight"),
        "w1": get("lins0-weight"),
        "b1": get("lins0-bias").reshape(-1),
        "w2": get("lins1-weight"),
        "b2": get("lins1-bias").reshape(-1),
        "wout": get("outp-weight"),
        "bout": get("outp-bias").reshape(-1),
        "bn_in": get("bn-weight").reshape(-1),
        "bn1_w": get("bns0-weight").reshape(-1),
        "bn1_b": get("bns0-bias").reshape(-1),
        "bn2_w": get("bns1-weight").reshape(-1),
        "bn2_b": get("bns1-bias").reshape(-1),
        "mean": mean.reshape(-1),
        "std": std.reshape(-1),
    }
    _check_shapes(p)
    return p


def _check_shapes(p):
    assert p["emb0"].shape == (8, 4) and p["emb1"].shape == (8, 4), (
        p["emb0"].shape, p["emb1"].shape)
    assert p["w1"].shape == (22, 17) and p["w2"].shape == (20, 22)
    assert p["wout"].shape == (49, 20)
    assert p["mean"].shape == (9,) and p["std"].shape == (9,)


def save_npz(path: str, per_qp: dict[int, dict[str, np.ndarray]]) -> None:
    flat = {}
    for qp, p in per_qp.items():
        for k, v in p.items():
            flat[f"qp{qp}/{k}"] = v
    np.savez(path, **flat)


def load_npz(path: str) -> dict[int, dict[str, np.ndarray]]:
    data = np.load(path)
    out: dict[int, dict[str, np.ndarray]] = {}
    for key in data.files:
        qp_s, k = key.split("/", 1)
        out.setdefault(int(qp_s[2:]), {})[k] = data[qp_s + "/" + k]
    return out


def select_qp_params(per_qp: dict[int, dict], qp: int) -> dict:
    """Reference QP fallback: untrained QPs silently use the QP22 set
    (TEncSearch.cpp:925) — kept, with a loud warning."""
    if qp in per_qp:
        return per_qp[qp]
    import warnings

    base = 22 if 22 in per_qp else sorted(per_qp)[0]
    warnings.warn(
        f"NN-FME has no weights for QP {qp}; falling back to QP {base} "
        "(reference behavior)")
    return per_qp[base]


def forward_np(p: dict, sads: np.ndarray, heights, widths) -> np.ndarray:
    """Reference-exact forward: (N, 9) SAD surfaces [TL,T,TR,L,C,R,BL,B,BR]
    -> (N, 49) logits (float32)."""
    x = (sads.astype(np.float32) - p["mean"]) / p["std"]
    x = x * p["bn_in"]
    e0 = p["emb0"][height_category(heights)]
    e1 = p["emb1"][width_category(widths)]
    inp = np.concatenate([e0, e1, x], axis=-1)  # (N, 17)
    h1 = inp @ p["w1"].T + p["b1"]
    h1 = np.maximum(h1, 0) * p["bn1_w"] + p["bn1_b"]
    h2 = h1 @ p["w2"].T + p["b2"]
    h2 = np.maximum(h2, 0) * p["bn2_w"] + p["bn2_b"]
    return h2 @ p["wout"].T + p["bout"]


def predict_np(p: dict, sads, heights, widths) -> np.ndarray:
    """-> (N, 2) quarter-pel (dx, dy)."""
    logits = forward_np(p, sads, heights, widths)
    return CLASS_TO_QMV[np.argmax(logits, axis=-1)]


def forward(p: dict, sads, height_cat, width_cat):
    """JAX batched forward; categories precomputed (device-friendly).
    sads (N, 9) int32/float32 -> (N, 49) float32 logits.
    Matmuls pinned to full fp32 (TPU MXU would otherwise use bf16 passes,
    flipping argmaxes near ties vs the reference's x86 floats)."""
    import jax
    import jax.numpy as jnp

    with jax.default_matmul_precision("float32"):
        x = (sads.astype(jnp.float32) - p["mean"]) / p["std"]
        x = x * p["bn_in"]
        e0 = p["emb0"][height_cat]
        e1 = p["emb1"][width_cat]
        inp = jnp.concatenate([e0, e1, x], axis=-1)
        h1 = inp @ p["w1"].T + p["b1"]
        h1 = jnp.maximum(h1, 0) * p["bn1_w"] + p["bn1_b"]
        h2 = h1 @ p["w2"].T + p["b2"]
        h2 = jnp.maximum(h2, 0) * p["bn2_w"] + p["bn2_b"]
        return h2 @ p["wout"].T + p["bout"]


def predict(p: dict, sads, height_cat, width_cat):
    import jax.numpy as jnp

    logits = forward(p, sads, height_cat, width_cat)
    cls = jnp.argmax(logits, axis=-1)
    table = jnp.asarray(CLASS_TO_QMV)
    return table[cls]


# --- training (FastAI-tabular-learner parity, in JAX/optax) -----------------

@dataclass
class TrainConfig:
    layers: tuple = (22, 20)
    emb_dim: int = 4
    n_classes: int = 49
    dropouts: tuple = (0.001, 0.01)
    lr: float = 3e-3
    epochs: int = 200
    batch_size: int = 1024
    bn_momentum: float = 0.1
    seed: int = 0


def init_train_params(rng: np.random.Generator, cfg: TrainConfig) -> dict:
    def lin(n_out, n_in):
        # kaiming-uniform-ish
        bound = np.sqrt(1.0 / n_in)
        return (
            rng.uniform(-bound, bound, (n_out, n_in)).astype(np.float32),
            rng.uniform(-bound, bound, (n_out,)).astype(np.float32),
        )

    w1, b1 = lin(cfg.layers[0], 17)
    w2, b2 = lin(cfg.layers[1], cfg.layers[0])
    wo, bo = lin(cfg.n_classes, cfg.layers[1])
    return {
        "emb0": (rng.standard_normal((8, cfg.emb_dim)) * 0.01).astype(np.float32),
        "emb1": (rng.standard_normal((8, cfg.emb_dim)) * 0.01).astype(np.float32),
        "w1": w1, "b1": b1, "w2": w2, "b2": b2, "wout": wo, "bout": bo,
        "bn_in_w": np.ones(9, np.float32),
        "bn1_w": np.ones(cfg.layers[0], np.float32),
        "bn1_b": np.zeros(cfg.layers[0], np.float32),
        "bn2_w": np.ones(cfg.layers[1], np.float32),
        "bn2_b": np.zeros(cfg.layers[1], np.float32),
    }


def train_forward(p, state, sads_n, hcat, wcat, train: bool, rng=None,
                  dropouts=(0.001, 0.01), momentum=0.1):
    """Training-time forward with live BatchNorm. sads_n are mapper-
    normalized. Returns (logits, new_state). state holds BN running stats."""
    import jax
    import jax.numpy as jnp

    eps = 1e-5

    def bn(x, mu_r, var_r, w, b, key):
        if train:
            mu = x.mean(0)
            var = x.var(0)
            new_mu = (1 - momentum) * mu_r + momentum * mu
            new_var = (1 - momentum) * var_r + momentum * var
        else:
            mu, var = mu_r, var_r
            new_mu, new_var = mu_r, var_r
        y = (x - mu) / jnp.sqrt(var + eps) * w
        if b is not None:
            y = y + b
        return y, new_mu, new_var

    s = dict(state)
    x, s["in_mu"], s["in_var"] = bn(
        sads_n, state["in_mu"], state["in_var"], p["bn_in_w"], None, None)
    e0 = p["emb0"][hcat]
    e1 = p["emb1"][wcat]
    inp = jnp.concatenate([e0, e1, x], axis=-1)
    h = jnp.maximum(inp @ p["w1"].T + p["b1"], 0)
    h, s["bn1_mu"], s["bn1_var"] = bn(
        h, state["bn1_mu"], state["bn1_var"], p["bn1_w"], p["bn1_b"], None)
    if train and rng is not None:
        rng, k = jax.random.split(rng)
        h = h * (jax.random.uniform(k, h.shape) >= dropouts[0]) / (1 - dropouts[0])
    h = jnp.maximum(h @ p["w2"].T + p["b2"], 0)
    h, s["bn2_mu"], s["bn2_var"] = bn(
        h, state["bn2_mu"], state["bn2_var"], p["bn2_w"], p["bn2_b"], None)
    if train and rng is not None:
        rng, k = jax.random.split(rng)
        h = h * (jax.random.uniform(k, h.shape) >= dropouts[1]) / (1 - dropouts[1])
    logits = h @ p["wout"].T + p["bout"]
    return logits, s


def init_bn_state(cfg: TrainConfig) -> dict:
    import numpy as np

    return {
        "in_mu": np.zeros(9, np.float32), "in_var": np.ones(9, np.float32),
        "bn1_mu": np.zeros(cfg.layers[0], np.float32),
        "bn1_var": np.ones(cfg.layers[0], np.float32),
        "bn2_mu": np.zeros(cfg.layers[1], np.float32),
        "bn2_var": np.ones(cfg.layers[1], np.float32),
    }


def export_inference_params(p: dict, state: dict, mean: np.ndarray,
                            std: np.ndarray) -> dict:
    """Fold BN running stats into the reference inference formula
    (which has no input-BN bias and applies scale/shift post-ReLU)."""
    eps = 1e-5
    in_sigma = np.sqrt(np.asarray(state["in_var"]) + eps)
    s1 = np.asarray(p["bn1_w"]) / np.sqrt(np.asarray(state["bn1_var"]) + eps)
    s2 = np.asarray(p["bn2_w"]) / np.sqrt(np.asarray(state["bn2_var"]) + eps)
    return {
        "emb0": np.asarray(p["emb0"]),
        "emb1": np.asarray(p["emb1"]),
        "w1": np.asarray(p["w1"]), "b1": np.asarray(p["b1"]),
        "w2": np.asarray(p["w2"]), "b2": np.asarray(p["b2"]),
        "wout": np.asarray(p["wout"]), "bout": np.asarray(p["bout"]),
        # (x - mean')/std' * bn_in == BN_nobias((x-mean)/std)
        "mean": mean + np.asarray(state["in_mu"]) * std,
        "std": std * in_sigma,
        "bn_in": np.asarray(p["bn_in_w"]),
        "bn1_w": s1,
        "bn1_b": np.asarray(p["bn1_b"]) - np.asarray(state["bn1_mu"]) * s1,
        "bn2_w": s2,
        "bn2_b": np.asarray(p["bn2_b"]) - np.asarray(state["bn2_mu"]) * s2,
    }


def train_fme(samples: np.ndarray, labels: np.ndarray, heights: np.ndarray,
              widths: np.ndarray, cfg: TrainConfig | None = None,
              mesh=None, verbose: bool = False):
    """Train one QP's MLP. samples (N,9) raw SADs; labels (N,) class ids.

    Data-parallel over `mesh` (jax.sharding.Mesh with axis 'data') when
    given. Returns (inference_params, val_accuracy)."""
    import jax
    import jax.numpy as jnp
    import optax

    cfg = cfg or TrainConfig()
    rng_np = np.random.default_rng(cfg.seed)
    n = len(samples)
    idx = rng_np.permutation(n)
    n_val = max(1, n // 5)
    tr, va = idx[n_val:], idx[:n_val]
    mean = samples[tr].mean(0).astype(np.float32)
    std = samples[tr].std(0).astype(np.float32) + 1e-7
    xs = ((samples - mean) / std).astype(np.float32)
    hcat = height_category(heights)
    wcat = width_category(widths)

    params = init_train_params(rng_np, cfg)
    state = init_bn_state(cfg)
    opt = optax.adam(cfg.lr)
    opt_state = opt.init(params)

    def loss_fn(p, s, key, xb, hb, wb, yb):
        logits, s2 = train_forward(p, s, xb, hb, wb, True, key, cfg.dropouts,
                                   cfg.bn_momentum)
        l = optax.softmax_cross_entropy_with_integer_labels(logits, yb).mean()
        return l, s2

    @jax.jit
    def step(p, s, o, key, xb, hb, wb, yb):
        (l, s2), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, s, key, xb, hb, wb, yb)
        if mesh is not None:
            pass  # grads already reduced by jit-over-sharded-batch
        upd, o2 = opt.update(g, o, p)
        return optax.apply_updates(p, upd), s2, o2, l

    key = jax.random.PRNGKey(cfg.seed)
    bs = min(cfg.batch_size, len(tr))
    xs_j = jnp.asarray(xs)
    h_j = jnp.asarray(hcat)
    w_j = jnp.asarray(wcat)
    y_j = jnp.asarray(labels.astype(np.int32))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P("data"))
        # batches are sharded over the data axis; jit inserts the psums

    for epoch in range(cfg.epochs):
        order = rng_np.permutation(len(tr))
        for i in range(0, len(tr), bs):
            b = tr[order[i : i + bs]]
            if len(b) < bs:
                b = np.concatenate([b, tr[order[: bs - len(b)]]])
            key, k = jax.random.split(key)
            bj = jnp.asarray(b)
            xb, hb, wb, yb = xs_j[bj], h_j[bj], w_j[bj], y_j[bj]
            if mesh is not None:
                xb = jax.device_put(xb, shard)
                yb = jax.device_put(yb, shard)
            params, state, opt_state, l = step(
                params, state, opt_state, k, xb, hb, wb, yb)
        if verbose and (epoch + 1) % 50 == 0:
            print(f"epoch {epoch+1}: loss {float(l):.4f}")

    # validation with folded inference params (tests the export too)
    inf = export_inference_params(params, state, mean, std)
    logits = forward_np(inf, samples[va], heights[va], widths[va])
    acc = float((np.argmax(logits, -1) == labels[va]).mean())
    return inf, acc
