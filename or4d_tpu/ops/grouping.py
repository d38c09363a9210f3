"""Point grouping ops — equivalents of `group_points` and the Query/Group
modules (reference: group_points_gpu.cu, pointnet2_utils.py:283-383).

On TPU these are plain batched gathers; XLA autodiff supplies the
scatter-add backward that the reference hand-writes in CUDA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from or4d_tpu.ops.ball_query import ball_query


def grouping_operation(features: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather neighbourhood features.

    ``features``: (B, C, N); ``idx``: (B, M, S) int -> (B, C, M, S).
    """
    B, C, N = features.shape
    _, M, S = idx.shape
    flat = jnp.take_along_axis(features, idx.reshape(B, 1, M * S), axis=2)
    return flat.reshape(B, C, M, S)


def query_and_group(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    features: jax.Array | None = None,
    use_xyz: bool = True,
) -> jax.Array:
    """Ball query + gather + center-relative xyz, the reference `QueryAndGroup`.

    ``xyz``: (B, N, 3); ``new_xyz``: (B, M, 3); ``features``: (B, C, N) or None.
    Returns (B, 3 + C, M, nsample) when ``use_xyz`` (reference layout).
    """
    idx = ball_query(radius, nsample, xyz, new_xyz)
    idx = jax.lax.stop_gradient(idx)
    xyz_t = jnp.swapaxes(xyz, 1, 2)  # (B, 3, N)
    grouped_xyz = grouping_operation(xyz_t, idx)  # (B, 3, M, S)
    grouped_xyz = grouped_xyz - jnp.swapaxes(new_xyz, 1, 2)[..., None]
    if features is not None:
        grouped_features = grouping_operation(features, idx)
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_features], axis=1)
        return grouped_features
    if not use_xyz:
        raise ValueError("cannot have neither features nor xyz")
    return grouped_xyz


def group_all(xyz: jax.Array, features: jax.Array | None = None, use_xyz: bool = True) -> jax.Array:
    """The reference `GroupAll`: treat the whole cloud as one group.

    ``xyz``: (B, N, 3); ``features``: (B, C, N) -> (B, 3 + C, 1, N).
    """
    grouped_xyz = jnp.swapaxes(xyz, 1, 2)[:, :, None, :]  # (B, 3, 1, N)
    if features is not None:
        grouped_features = features[:, :, None, :]
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_features], axis=1)
        return grouped_features
    return grouped_xyz
