#!/usr/bin/env python
"""Merge per-QP bdrate.py JSONs (written by tools/rd_queue.sh, one process
per QP) into combined BD-rate numbers per clip."""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bdrate import bd_rate  # noqa: E402


def merge(outdir: str, tag: str, dest: str) -> dict | None:
    rows = []
    for p in sorted(glob.glob(os.path.join(outdir, f"bd_{tag}_qp*.json"))):
        with open(p) as f:
            d = json.load(f)
        for qp, hm, ours in zip(d["qps"], d["hm"], d["ours"]):
            rows.append((qp, hm, ours))
    if len(rows) < 3:
        return None
    rows.sort()
    res = dict(qps=[r[0] for r in rows], hm=[r[1] for r in rows],
               ours=[r[2] for r in rows])
    res["bd_rate_y"] = bd_rate(
        [r[1]["kbps"] for r in rows], [r[1]["y"] for r in rows],
        [r[2]["kbps"] for r in rows], [r[2]["y"] for r in rows])
    with open(os.path.join(outdir, dest), "w") as f:
        json.dump(res, f, indent=1)
    return res


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "results"
    rnd = os.environ.get("RD_ROUND", "r04")
    for tag, dest, name in ((f"nat", f"bdrate_{rnd}_natural.json",
                             "natural 416x240x32"),
                            (f"syn", f"bdrate_{rnd}_ldp_nn.json",
                             "synthetic 192x128x12")):
        r = merge(outdir, tag, dest)
        if r:
            print(f"{name}: BD-rate(Y) {r['bd_rate_y']:+.2f}% "
                  f"({len(r['qps'])} QPs)")
        else:
            print(f"{name}: insufficient per-QP results")


if __name__ == "__main__":
    main()
