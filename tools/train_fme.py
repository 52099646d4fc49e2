#!/usr/bin/env python
"""Train the NN-FME MLP from an extracted dataset and export runtime
weights.

Counterpart of NN_training.ipynb (FastAI tabular learner, cells 5/10/14 —
SURVEY.md §3.5) reimplemented in JAX/optax (tpuhevc.models.nnfme.train_fme)
with BN running stats folded into the inference parameters at export.

Usage:
  python tools/extract_fme_dataset.py data_q32.csv --qp 32
  python tools/train_fme.py weights.npz --data data_q32.csv:32 \
      [--data data_q22.csv:22 ...] [--epochs 200]
  python -m tpuhevc enc ... --FmeMode=nn --NNWeightsDir=weights.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_csv(path):
    rows = np.loadtxt(path, delimiter=",", skiprows=1, dtype=np.int64)
    sads = rows[:, :9].astype(np.float32)
    widths = rows[:, 9].astype(np.int32)
    heights = rows[:, 10].astype(np.int32)
    labels = rows[:, 11].astype(np.int32)
    return sads, heights, widths, labels


def main():
    from tpuhevc.models import nnfme

    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--data", action="append", required=True,
                    help="csv_path:qp (repeatable)")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=3e-3)
    a = ap.parse_args()
    per_qp = {}
    for spec in a.data:
        path, qp = spec.rsplit(":", 1)
        qp = int(qp)
        sads, heights, widths, labels = load_csv(path)
        cfg = nnfme.TrainConfig(epochs=a.epochs, lr=a.lr)
        params, acc = nnfme.train_fme(sads, labels, heights, widths, cfg)
        per_qp[qp] = params
        print(f"QP {qp}: {len(labels)} samples, val acc {acc:.2%}")
    nnfme.save_npz(a.out, per_qp)
    print(f"wrote {a.out} ({sorted(per_qp)} QPs)")


if __name__ == "__main__":
    main()
