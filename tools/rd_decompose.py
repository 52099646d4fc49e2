#!/usr/bin/env python
"""Per-POC RD decomposition vs the HM anchor.

Runs one QP on one clip through BOTH encoders and prints a per-frame
bits/PSNR table plus I/P totals, so an equal-QP bit gap (e.g. the
1.6x seen on the natural 416x240 clip) can be attributed to the intra
frame vs the P-frame tail vs PSNR offset. Methodology matches the
reference's per-POC log lines (TEncGOP.cpp:2108) — this is the
comparison HM developers do by eyeballing two logs side by side.

Usage:
  python tools/rd_decompose.py --clip /tmp/natural416.yuv --width 416 \
      --height 240 --frames 32 --qp 27 [--fme nn]
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HMREF = os.environ.get("HMREF", "/tmp/hmref")
REF_CFG = "/root/reference/cfg/encoder_lowdelay_P_main.cfg"

POC_RE = re.compile(
    r"POC\s+(\d+)\s+TId:\s*\d+\s+\(\s*([IPB])-SLICE,\s*nQP\s+(-?\d+)\s+QP"
    r"\s+(-?\d+)\s*\)\s+(\d+)\s+bits\s+\[Y\s+([\d.]+)\s+dB\s+U\s+([\d.]+)"
    r"\s+dB\s+V\s+([\d.]+)\s+dB\]")


def run_hm(yuv, w, h, n, qp, save=None):
    enc = os.path.join(HMREF, "TAppEncoder")
    with tempfile.TemporaryDirectory() as td:
        out = save or os.path.join(td, "str.bin")
        cmd = [enc, "-c", REF_CFG, "-i", yuv, "-wdt", str(w), "-hgt",
               str(h), "-f", str(n), "-fr", "50", "-q", str(qp), "-b", out,
               "--ConformanceWindowMode=1", "--Level=4.1",
               "--SEIDecodedPictureHash=1"]
        r = subprocess.run(cmd, input=b"\n", capture_output=True,
                           timeout=3600)
        text = r.stdout.decode(errors="replace")
        if r.returncode != 0:
            raise RuntimeError(text + r.stderr.decode(errors="replace"))
    frames = {}
    for m in POC_RE.finditer(text):
        frames[int(m.group(1))] = dict(
            stype=m.group(2), qp=int(m.group(4)), bits=int(m.group(5)),
            y=float(m.group(6)), u=float(m.group(7)), v=float(m.group(8)))
    return frames


def run_ours(yuv, w, h, n, qp, fme, save=None):
    from tpuhevc.codec.encoder import encode_sequence
    from tpuhevc.config.options import build_config, parse_cfg_file
    from tpuhevc.utils.yuv import YuvReader

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    opts = parse_cfg_file(os.path.join(repo, "cfg",
                                       "encoder_lowdelay_P_main.cfg"))
    opts.update(SourceWidth=str(w), SourceHeight=str(h),
                FramesToBeEncoded=str(n), FrameRate="50", QP=str(qp),
                FmeMode=fme)
    cfg, _ = build_config(opts)
    try:
        import jax  # noqa: F401

        cfg.inter_backend = "jax"
    except Exception:
        pass
    reader = YuvReader(yuv, w, h, cfg.sps.bit_depth)
    enc, _ = encode_sequence(reader, cfg, max_frames=n)
    if save:
        with open(save, "wb") as f:
            f.write(enc.bitstream())
    return {r.poc: dict(stype="I" if r.poc == 0 else "P", bits=r.bits,
                        y=r.psnr_y, u=r.psnr_u, v=r.psnr_v)
            for r in enc.results}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clip", required=True)
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--qp", type=int, default=27)
    ap.add_argument("--fme", default="nn")
    ap.add_argument("--save-dir", default=None,
                    help="keep both streams here (hm_qpN.bin/our_qpN.bin) "
                         "for tools/stream_profile.py")
    a = ap.parse_args()

    sh = so = None
    if a.save_dir:
        os.makedirs(a.save_dir, exist_ok=True)
        sh = os.path.join(a.save_dir, f"hm_qp{a.qp}.bin")
        so = os.path.join(a.save_dir, f"our_qp{a.qp}.bin")
    hm = run_hm(a.clip, a.width, a.height, a.frames, a.qp, save=sh)
    ours = run_ours(a.clip, a.width, a.height, a.frames, a.qp, a.fme,
                    save=so)

    print(f"\n POC T |   HM bits    Y dB |  our bits    Y dB |  ratio  dY")
    tot = dict(I=[0, 0], P=[0, 0])
    for poc in sorted(hm):
        h_, o = hm[poc], ours.get(poc)
        if o is None:
            continue
        t = h_["stype"]
        tot[t][0] += h_["bits"]
        tot[t][1] += o["bits"]
        print(f"{poc:4d} {t} | {h_['bits']:9d} {h_['y']:7.3f} |"
              f" {o['bits']:9d} {o['y']:7.3f} |"
              f" {o['bits']/max(h_['bits'],1):6.2f}x {o['y']-h_['y']:+.3f}")
    for t in "IP":
        if tot[t][0]:
            print(f"{t} total: HM {tot[t][0]:9d}  ours {tot[t][1]:9d}  "
                  f"({tot[t][1]/tot[t][0]:.2f}x)")
    ha = sum(v[0] for v in tot.values())
    oa = sum(v[1] for v in tot.values())
    print(f"ALL    : HM {ha:9d}  ours {oa:9d}  ({oa/ha:.2f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
