"""Batched signal-processing kernels (the reference's TLibCommon L3 layer:
TComTrQuant butterflies, TComInterpolationFilter DCT-IF, TComRdCost SAD/SATD,
TComPrediction intra/inter, TComLoopFilter, SAO — SURVEY.md §2.1),
restructured as dense batched ops over thousands of blocks.

Each op has an exact integer numpy core (host decoder / golden tests) and a
JAX variant for the device path; Pallas kernels live in ops/pallas_kernels.
"""
