"""Scale-out: device mesh helpers, CTU-tile sharding with halo exchange,
GOP-level parallelism. The reference is single-threaded (SURVEY.md §2.5);
these are the TPU-native equivalents: jax.sharding + shard_map over a Mesh,
ppermute halo exchange for cross-tile reference windows and filters, DP over
frames/GOPs, data-parallel NN-FME training."""
