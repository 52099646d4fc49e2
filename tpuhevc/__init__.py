"""tpuhevc — a TPU-native HEVC (HM-16.9-class) encoder/decoder framework.

A from-scratch rebuild of the capabilities of the HM-16.9 reference software
plus its NN-FME fork (zinsayon/HM16.9-NN_FME): a conforming HEVC Main-profile
encoder whose fractional-pel motion estimation is a per-QP MLP, restructured
TPU-first:

- the compute path (transforms, quantization, intra prediction, DCT-IF
  interpolation, SAD/SATD costs, motion search, the NN-FME MLP) is JAX/XLA/
  Pallas, batched over thousands of blocks per dispatch instead of HM's
  per-block recursion;
- the inherently sequential normative entropy layer (CABAC) runs host-side,
  fed by device-computed decision/coefficient tensors;
- scale-out is jax.sharding over a device mesh (CTU-tile sharding with halo
  exchange, GOP-level parallelism) rather than threads/MPI.

Layer map mirrors SURVEY.md §1; component parity tracked against SURVEY.md §2.
"""

__version__ = "0.1.0"
