"""Codec engines: encoder pipeline, decoder, DPB/GOP management.

Counterpart of the reference's TLibEncoder (TEncTop/TEncGOP/TEncSlice/
TEncCu/TEncSearch) and TLibDecoder (TDecTop/TDecSlice/TDecCu) layers
(SURVEY.md §2.2, §2.3) — restructured: per-frame batched device passes for
analysis/decision/reconstruction, host-side serialization.
"""
