"""3-NN feature interpolation — equivalents of `three_nn` / `three_interpolate`
(reference: interpolate_gpu.cu:9-154).

`three_nn` is a brute-force 3-smallest-distances search; on TPU that is the
MXU pairwise-distance expansion followed by `lax.top_k` on negated distances.
`three_interpolate` is a weighted gather whose scatter-add backward comes from
JAX autodiff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from or4d_tpu.ops.ball_query import pairwise_sqdist


def three_nn(unknown: jax.Array, known: jax.Array) -> tuple[jax.Array, jax.Array]:
    """For each unknown point, the 3 nearest known points.

    ``unknown``: (B, n, 3); ``known``: (B, m, 3).
    Returns (dist, idx): (B, n, 3) euclidean distances (sorted ascending) and
    int32 indices into m.
    """
    d2 = pairwise_sqdist(unknown, known)  # (B, n, m)
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def three_interpolate(features: jax.Array, idx: jax.Array, weight: jax.Array) -> jax.Array:
    """Weighted interpolation of features at 3 neighbours.

    ``features``: (B, c, m); ``idx``: (B, n, 3); ``weight``: (B, n, 3).
    Returns (B, c, n).
    """
    B, c, m = features.shape
    _, n, _ = idx.shape
    gathered = jnp.take_along_axis(features, idx.reshape(B, 1, n * 3), axis=2).reshape(B, c, n, 3)
    return jnp.sum(gathered * weight[:, None, :, :], axis=-1)
