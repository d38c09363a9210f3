"""SPMD parallelism layer: device mesh + sharding rules.

The reference's distributed story is DataParallel/DDP flags (SURVEY.md §2
inventory); the TPU-native equivalent is one comms layer on `jax.sharding`:
scenes shard over the 'dp' mesh axis, the padded object/edge axes shard over
'mp' (the per-scene "sequence" axis of this workload), and XLA inserts the
gradient psum / BN-stat collectives over ICI.
"""

from or4d_tpu.parallel.mesh import make_mesh, batch_sharding, replicated

__all__ = ["make_mesh", "batch_sharding", "replicated"]
