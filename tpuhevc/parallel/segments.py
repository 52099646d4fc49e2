"""Segment-parallel encoding: the GOP/IRAP-level parallel axis.

Counterpart of the reference's only inter-picture parallel dimension
(SURVEY.md §2.5: "frames within different GOPs ... can encode
concurrently given DPB deps; this is the multi-host axis"): closed
IRAP-led segments have no cross-segment prediction, so their device
stages run concurrently on different chips; host serialization stitches
the Annex-B stream in order.

encode_segments_parallel places each segment's device work on its own
device; encode_segments_overlapped additionally interleaves the segment
scan chunks so every device has a chunk in flight before any fetch
blocks (N-wide overlap on an N-chip mesh, validated in test_parallel on
the virtual CPU mesh; single-chip both degrade to sequential).
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


def encode_segments_overlapped(frames, cfg, n_segments: int | None = None,
                               devices=None, chunk_frames: int = 8):
    """Segment-parallel encode with device overlap: every segment gets its
    own LdpScanDriver placed on its own device; each round dispatches one
    chunk per segment (async) before collecting any, so on an N-device
    mesh N chunks compute concurrently while the host serializes.
    Returns (bitstream bytes, per-frame FrameResults in display order)."""
    import jax

    from ..codec.encoder import Encoder, LdpScanDriver
    from ..entropy import bitio

    devices = devices or jax.devices()
    if n_segments is None:
        n_segments = min(len(devices), max(1, len(frames) // 8))
    segs = split_segments(len(frames), n_segments)

    drivers = []
    for k, (s, ln) in enumerate(segs):
        dev = devices[k % len(devices)]
        enc = Encoder(dataclasses.replace(cfg))

        def finish(i, fr, pre=None, slice_info=None, _enc=enc):
            _enc.encode_frame(*fr, poc=i, precomputed=pre,
                              slice_info=slice_info)

        with jax.default_device(dev):
            drv = LdpScanDriver(enc, enc.cfg, frames[s : s + ln], finish,
                                chunk_frames)
            drv.start()
        drivers.append((dev, enc, drv))

    rounds = max(d.num_chunks() for _, _, d in drivers)
    for ci in range(rounds):
        for dev, _, drv in drivers:  # dispatch everywhere first (async)
            if ci < drv.num_chunks():
                with jax.default_device(dev):
                    drv.dispatch(ci)
        for dev, _, drv in drivers:  # then serialize the previous round
            if ci > 0 and ci - 1 < drv.num_chunks():
                drv.collect()
    for _, _, drv in drivers:
        drv.collect()

    nals_all, first_all, results = [], [], []
    for k, (_, enc, _) in enumerate(drivers):
        if k == 0:
            nals_all.extend(enc.nals)
            first_all.extend(enc.first_of_au)
        else:  # drop the repeated parameter sets, keep IDR + rest
            nals_all.extend(enc.nals[3:])
            first_all.extend(enc.first_of_au[3:])
        results.extend(enc.results)
    return bitio.write_annexb(nals_all, first_all), results
