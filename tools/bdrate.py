#!/usr/bin/env python
"""BD-rate harness: encode the same clip with the reference HM encoder
(/tmp/hmref/TAppEncoder, built by tools/build_ref_binaries.sh) and with
this framework at QP {22,27,32,37}, and report the Bjontegaard delta rate
(BD-rate, negative = we need fewer bits at equal quality).

This is the round-over-round RD scoreboard demanded by the north star
(BD-rate <= the HM16.9+NN-FME anchor; BASELINE.md). Methodology matches
the reference's prescribed practice: per-sequence bits + Y-PSNR from the
encoder logs, BD computed offline (SURVEY.md §4.2, TEncAnalyze.h:139).

Usage:
  python tools/bdrate.py [--width 192 --height 128 --frames 12]
      [--qps 22,27,32,37] [--fme nn] [--clip /path.yuv] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HMREF = os.environ.get("HMREF", "/tmp/hmref")
REF_CFG = "/root/reference/cfg/encoder_lowdelay_P_main.cfg"


def bd_rate(rate_a, psnr_a, rate_b, psnr_b) -> float:
    """Bjontegaard delta-rate of B vs A in percent (negative: B better).
    Cubic fit of log-rate over PSNR, integrated over the common PSNR
    interval — the standard JCT-VC computation."""
    la, lb = np.log(rate_a), np.log(rate_b)
    pa = np.polyfit(psnr_a, la, 3)
    pb = np.polyfit(psnr_b, lb, 3)
    lo = max(min(psnr_a), min(psnr_b))
    hi = min(max(psnr_a), max(psnr_b))
    ia = np.polyval(np.polyint(pa), hi) - np.polyval(np.polyint(pa), lo)
    ib = np.polyval(np.polyint(pb), hi) - np.polyval(np.polyint(pb), lo)
    return float((np.exp((ib - ia) / (hi - lo)) - 1) * 100)


def run_hm(yuv: str, w: int, h: int, n: int, qp: int, fr: int = 50,
           cfg: str = REF_CFG) -> dict:
    """One HM anchor encode; returns dict(kbps, y, u, v) from its summary.
    Results are cached on disk (the anchor is fixed; re-measuring our
    encoder during a round must not pay the HM encode again)."""
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", "results", "hm_cache")
    key = f"{os.path.basename(yuv)}_{w}x{h}x{n}_qp{qp}_fr{fr}.json"
    cpath = os.path.join(cache_dir, key)
    if os.path.exists(cpath):
        with open(cpath) as f:
            return json.load(f)
    enc = os.path.join(HMREF, "TAppEncoder")
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "str.bin")
        cmd = [enc, "-c", cfg, "-i", yuv, "-wdt", str(w), "-hgt", str(h),
               "-f", str(n), "-fr", str(fr), "-q", str(qp), "-b", out,
               "--ConformanceWindowMode=1", "--Level=4.1",
               "--SEIDecodedPictureHash=1"]  # ours always carries the
               # hash SEI (the conformance oracle); compare like for like
        # the fork's encmain has a trailing getchar() (SURVEY.md §A.4.1)
        r = subprocess.run(cmd, input=b"\n", capture_output=True,
                           timeout=3600)
        text = r.stdout.decode(errors="replace")
        if r.returncode != 0:
            raise RuntimeError(f"HM encoder failed:\n{text}\n"
                               + r.stderr.decode(errors="replace"))
        bits = os.path.getsize(out) * 8
        # SUMMARY row: "<n> a <bitrate> <Y> <U> <V>"
        lines = text.splitlines()
        for i, ln in enumerate(lines):
            if ln.strip().startswith("Total Frames"):
                t = lines[i + 1].split()
                res = dict(kbps=float(t[2]), y=float(t[3]), u=float(t[4]),
                           v=float(t[5]), bits=bits)
                os.makedirs(cache_dir, exist_ok=True)
                with open(cpath, "w") as f:
                    json.dump(res, f)
                return res
    raise RuntimeError("HM summary not found:\n" + text)


def run_ours(yuv: str, w: int, h: int, n: int, qp: int, fr: int = 50,
             fme: str = "nn", cfg_path: str | None = None,
             backend: str | None = None) -> dict:
    """One encode with this framework (in-process); returns like run_hm."""
    from tpuhevc.codec.encoder import encode_sequence
    from tpuhevc.config.options import build_config, parse_cfg_file
    from tpuhevc.utils.yuv import YuvReader

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_path = cfg_path or os.path.join(repo, "cfg",
                                        "encoder_lowdelay_P_main.cfg")
    opts = parse_cfg_file(cfg_path)
    opts.update(SourceWidth=str(w), SourceHeight=str(h),
                FramesToBeEncoded=str(n), FrameRate=str(fr), QP=str(qp),
                FmeMode=fme)
    cfg, _ = build_config(opts)
    if backend:
        cfg.inter_backend = backend
    else:
        try:
            import jax  # noqa: F401

            cfg.inter_backend = "jax"
        except Exception:
            pass
    reader = YuvReader(yuv, w, h, cfg.sps.bit_depth)
    enc, _ = encode_sequence(reader, cfg, max_frames=n)
    bits = len(enc.bitstream()) * 8
    ys = [r.psnr_y for r in enc.results]
    us = [r.psnr_u for r in enc.results]
    vs = [r.psnr_v for r in enc.results]
    return dict(kbps=bits * fr / n / 1000, y=float(np.mean(ys)),
                u=float(np.mean(us)), v=float(np.mean(vs)), bits=bits)


def sweep(yuv: str, w: int, h: int, n: int, qps, fme: str = "nn",
          verbose: bool = True, backend: str | None = None) -> dict:
    hm, ours = [], []
    for qp in qps:
        a = run_hm(yuv, w, h, n, qp)
        # the shared device tunnel drops connections occasionally;
        # transient JaxRuntimeErrors are worth a few retries
        for attempt in range(3):
            try:
                b = run_ours(yuv, w, h, n, qp, fme=fme, backend=backend)
                break
            except Exception as e:
                if attempt == 2:
                    raise
                print(f"QP{qp} ours attempt {attempt}: "
                      f"{type(e).__name__}: {e}", flush=True)
        hm.append(a)
        ours.append(b)
        if verbose:
            print(f"QP{qp}: HM {a['bits']/8:8.0f} B @ {a['y']:.3f} dB | "
                  f"ours {b['bits']/8:8.0f} B @ {b['y']:.3f} dB "
                  f"({b['bits']/a['bits']:.2f}x bits, "
                  f"{b['y']-a['y']:+.3f} dB)", flush=True)
    bd = bd_rate([a["kbps"] for a in hm], [a["y"] for a in hm],
                 [b["kbps"] for b in ours], [b["y"] for b in ours])
    return dict(qps=list(qps), hm=hm, ours=ours, bd_rate_y=bd, fme=fme,
                width=w, height=h, frames=n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clip", default=None, help="YUV420 8-bit input")
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--qps", default="22,27,32,37")
    ap.add_argument("--fme", default="nn", choices=["nn", "dctif", "none"])
    ap.add_argument("--backend", default=None)
    ap.add_argument("--json", default=None)
    a = ap.parse_args()
    qps = [int(q) for q in a.qps.split(",")]

    clip = a.clip
    if clip is None:
        from make_test_clip import make_clip

        clip = tempfile.NamedTemporaryFile(suffix=".yuv", delete=False).name
        with open(clip, "wb") as f:
            f.write(make_clip(a.width, a.height, a.frames))
    res = sweep(clip, a.width, a.height, a.frames, qps, a.fme,
                backend=a.backend)
    print(f"\nBD-rate (Y) vs HM16.9 anchor: {res['bd_rate_y']:+.2f}%")
    if a.json:
        with open(a.json, "w") as f:
            json.dump(res, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.exit(main())
