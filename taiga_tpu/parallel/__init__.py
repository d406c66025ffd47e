"""Multi-chip scaling: sharded MSM/NTT and batch-proof data parallelism.

The reference has no distributed layer (SURVEY.md §2.5); this is the
first-class TPU equivalent: `jax.sharding.Mesh` + `shard_map`, with MSM point
partitions reduced via all-gather + Jacobian fold and proof batches
data-parallel across devices. Collectives ride ICI within a slice.
"""
