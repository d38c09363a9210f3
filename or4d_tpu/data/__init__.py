"""Data layer: vocab, scene assembly, fixed-shape tensor preparation,
augmentations, loss weights, and synthetic fixtures.

Replaces the reference's open3d/torch per-scan preprocessing
(`scene_graph_helpers/dataset/*`) with a deterministic, cached, numpy ingest
producing padded static-shape arrays that batch and shard on TPU.
"""

from or4d_tpu.data.vocab import Vocab, DEFAULT_VOCAB
from or4d_tpu.data.scene_batch import SceneBatch, SceneSample

__all__ = ["Vocab", "DEFAULT_VOCAB", "SceneBatch", "SceneSample"]
