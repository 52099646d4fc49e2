"""CLI applications: encoder + decoder.

Counterpart of the reference's App/TAppEncoder (encmain.cpp, TAppEncTop)
and App/TAppDecoder (SURVEY.md §2.3 L6): HM-compatible options, per-POC
log lines, summary table, Annex-B output — without the trailing getchar()
quirk (SURVEY.md §A.4.1).

Usage:
  python -m tpuhevc enc -c cfg/encoder_intra_main.cfg -i in.yuv \
      -b out.bin -o rec.yuv -wdt 416 -hgt 240 -f 8 -q 32
  python -m tpuhevc dec -b out.bin -o dec.yuv
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main_encode(argv: list[str]) -> int:
    from .codec.encoder import encode_sequence
    from .config.options import build_config, parse_args
    from .utils.yuv import YuvReader, write_yuv

    opts = parse_args(argv)
    cfg, io = build_config(opts)
    if not io["InputFile"] or not io["BitstreamFile"]:
        print("need -i input.yuv and -b out.bin", file=sys.stderr)
        return 2
    if "InterBackend" not in opts:
        try:
            import jax  # noqa: F401

            cfg.inter_backend = "jax"
        except Exception:
            pass
    reader = YuvReader(io["InputFile"], cfg.sps.width, cfg.sps.height,
                       cfg.sps.bit_depth)
    t0 = time.time()
    enc, recons = encode_sequence(reader, cfg, verbose=False)
    total_bits = 0
    psnrs = np.zeros(3)
    for r in enc.results:
        stype = "I" if enc._slice_type(r.poc) == 2 else "P"
        print(
            f"POC {r.poc:4d} ( {stype}-SLICE, QP {cfg.qp} ) "
            f"{r.bits:10d} bits [Y {r.psnr_y:.4f} dB  U {r.psnr_u:.4f} dB  "
            f"V {r.psnr_v:.4f} dB] [MD5:{r.md5[0].hex()}]"
        )
        total_bits += r.bits
        psnrs += [r.psnr_y, r.psnr_u, r.psnr_v]
    n = len(enc.results)
    kbps = total_bits * cfg.frame_rate / n / 1000 if n else 0
    print("\nSUMMARY " + "-" * 56)
    print("\tTotal Frames |   Bitrate     Y-PSNR    U-PSNR    V-PSNR")
    print(f"\t{n:12d} a {kbps:12.4f} {psnrs[0]/max(n,1):9.4f} "
          f"{psnrs[1]/max(n,1):9.4f} {psnrs[2]/max(n,1):9.4f}")
    data = enc.bitstream()
    with open(io["BitstreamFile"], "wb") as f:
        f.write(data)
    print(f"\nBytes written to file: {len(data)}"
          f" ({len(data) * 8 * cfg.frame_rate / max(n, 1) / 1000:.3f} kbps)")
    if io["ReconFile"]:
        crop = [(y[: cfg.sps.height, : cfg.sps.width],
                 u[: cfg.sps.height // 2, : cfg.sps.width // 2],
                 v[: cfg.sps.height // 2, : cfg.sps.width // 2])
                for (y, u, v) in recons]
        write_yuv(io["ReconFile"], crop, cfg.sps.bit_depth)
    print(f"\n Total Time: {time.time() - t0:12.3f} sec.")
    return 0


def main_decode(argv: list[str]) -> int:
    from .codec.decoder import decode_stream
    from .utils.yuv import write_yuv

    bit_path = out_path = None
    i = 0
    while i < len(argv):
        if argv[i] == "-b":
            bit_path = argv[i + 1]
            i += 2
        elif argv[i] == "-o":
            out_path = argv[i + 1]
            i += 2
        else:
            raise SystemExit(f"unknown option {argv[i]}")
    if not bit_path:
        print("need -b bitstream", file=sys.stderr)
        return 2
    data = open(bit_path, "rb").read()
    frames = decode_stream(data)
    ok = True
    for f in frames:
        status = "OK" if f.md5_ok else ("unk" if f.md5_ok is None else "***ERROR***")
        print(f"POC {f.poc:4d} [MD5:({status})]")
        ok &= f.md5_ok is not False
    if out_path and frames:
        disp = sorted(frames, key=lambda f: f.poc)
        write_yuv(out_path, [(f.y, f.u, f.v) for f in disp])
    return 0 if ok else 1


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in ("enc", "dec"):
        print(__doc__)
        return 2
    if sys.argv[1] == "enc":
        return main_encode(sys.argv[2:])
    return main_decode(sys.argv[2:])


if __name__ == "__main__":
    sys.exit(main())
