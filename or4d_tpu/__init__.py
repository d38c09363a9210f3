"""or4d_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the 4D-OR framework.

A brand-new implementation, designed TPU-first, with the capabilities of the
reference 4D-OR pipeline (egeozsoy/4D-OR):

  L0  data/config       -> :mod:`or4d_tpu.config`, :mod:`or4d_tpu.data.vocab`
  L1  perception        -> :mod:`or4d_tpu.models.voxelpose`, :mod:`or4d_tpu.models.groupfree`
  L2  instance labels   -> :mod:`or4d_tpu.pipeline.instance_labels`
  L3  scene graphs      -> :mod:`or4d_tpu.models.sgpn` (+ ops/, data/, train/)
  L4  downstream        -> :mod:`or4d_tpu.pipeline.roles_heuristic`,
                           :mod:`or4d_tpu.models.graphormer`, :mod:`or4d_tpu.pipeline.phases`
  L5  eval/vis          -> :mod:`or4d_tpu.train.metrics`, :mod:`or4d_tpu.utils`

Core idioms (vs. the CUDA/torch reference):
  * all ragged structures (object count, edge count, crop sizes) are padded to
    static shapes with masks, so every model is jittable and vmappable;
  * point-cloud primitives (FPS, ball query, grouping, 3-NN interpolation) are
    implemented as XLA/Pallas ops instead of CUDA kernels;
  * scaling is SPMD over a `jax.sharding.Mesh` (scene-level data parallelism +
    edge/object-axis model parallelism), not DataParallel/DDP.
"""

__version__ = "0.1.0"
