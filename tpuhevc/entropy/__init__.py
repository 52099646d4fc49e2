"""Entropy layer: bit I/O, NAL framing, CABAC engine, HEVC syntax coding.

This layer is host-side by design: CABAC is a bit-serial normative process
(ITU-T H.265 §9.3) that cannot be usefully mapped onto the MXU/VPU. The TPU
side produces per-frame decision/coefficient tensors; this layer serializes
them. Counterpart of the reference's TLibCommon bitstream/CABAC primitives +
TLibEncoder entropy stack (SURVEY.md §2 L2: TComBitStream, ContextModel,
TEncSbac, TEncBinCoderCABAC, TEncCavlc, NALwrite) and the TLibDecoder mirror.
"""
