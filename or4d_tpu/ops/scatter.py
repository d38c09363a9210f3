"""Segment ops for graph message passing.

Replaces the reference's `torch_scatter.scatter` usage in the TripletGCN
(network_TripletGCN.py:54-58) with JAX segment primitives. All graph shapes
here are static (padded), so `num_segments` is always known at trace time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """Sum rows of ``data`` (E, C) into ``num_segments`` buckets."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_max(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_mean(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    sums = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    counts = jax.ops.segment_sum(jnp.ones((data.shape[0],), data.dtype), segment_ids, num_segments=num_segments)
    return sums / jnp.maximum(counts, 1.0)[:, None]
