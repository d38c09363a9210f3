"""Ball query with reference first-hit padding semantics — TPU-native.

The reference CUDA kernel (`_ext-src/src/ball_query_gpu.cu:9-44`) scans points
in index order and, per query center, collects the first ``nsample`` indices
with squared distance < radius²; when the FIRST in-radius point is found, all
``nsample`` slots are pre-filled with it, so queries with fewer than
``nsample`` neighbours are padded with the first hit.

TPU formulation: pairwise distances ride the MXU via the
``|a|² + |b|² − 2a·b`` expansion; "first k in scan order" is a `lax.top_k`
over order-encoding integer keys (valid positions sort ascending before all
invalid ones), which XLA lowers to an efficient partial sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared euclidean distances between point sets.

    ``a``: (..., M, 3), ``b``: (..., N, 3) -> (..., M, N).
    Uses the matmul expansion so the inner product lands on the MXU.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=-1)[..., :, None]
    b2 = jnp.sum(b * b, axis=-1)[..., None, :]
    # full-f32 MXU passes: bf16 default precision flips radius-boundary
    # membership by ~1e-2, which is far beyond re-validation tolerance
    ab = jnp.einsum(
        "...mc,...nc->...mn",
        a,
        b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


def _ball_query_block(radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array) -> jax.Array:
    N = xyz.shape[-2]
    d2 = pairwise_sqdist(new_xyz, xyz)  # (B, M, N)
    within = d2 < (radius * radius)
    pos = jax.lax.broadcasted_iota(jnp.int32, d2.shape, dimension=d2.ndim - 1)
    # order-encoding keys: valid -> -p in (-N, 0]; invalid -> -(N+p) < -N.
    # top_k (largest first) therefore yields valid positions in scan order.
    keys = jnp.where(within, -pos, -(pos + N))
    top, _ = jax.lax.top_k(keys, nsample)  # (B, M, nsample)
    hit = top > -N
    idx = jnp.where(hit, -top, -top - N)
    first = idx[..., 0:1]
    return jnp.where(hit, idx, first).astype(jnp.int32)


# cap the (chunk, M, N) distance/key temporaries: chunk*M*N*4B*~3 <= ~1.5GB
_CHUNK_ELEMS = 128 * 1024 * 1024


@functools.partial(jax.jit, static_argnums=(0, 1))
def ball_query(radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array) -> jax.Array:
    """First-``nsample``-within-radius neighbour indices.

    ``xyz``: (B, N, 3) support points; ``new_xyz``: (B, M, 3) query centers.
    Returns (B, M, nsample) int32 indices into N, padded with the first hit
    (reference semantics). If a query has zero hits the slots hold the overall
    first index (deterministic; the reference leaves them uninitialized, but
    in the PointNet++ pipeline queries are FPS-selected support points so the
    self-distance-0 hit guarantees >= 1 neighbour).

    Large batches are processed in `lax.map` chunks so the (B, M, N)
    distance/key temporaries stay HBM-bounded (a padded scene batch is
    B = scenes x 132 edges rows).
    """
    B, M, _ = new_xyz.shape
    N = xyz.shape[-2]
    per_row = M * N
    chunk = max(1, min(B, _CHUNK_ELEMS // max(per_row, 1)))
    if chunk >= B:
        return _ball_query_block(radius, nsample, xyz, new_xyz)
    # pad B to a chunk multiple, map over chunks
    pad = (-B) % chunk
    xyz_p = jnp.pad(xyz, ((0, pad), (0, 0), (0, 0)))
    new_p = jnp.pad(new_xyz, ((0, pad), (0, 0), (0, 0)))
    nchunks = (B + pad) // chunk
    xyz_c = xyz_p.reshape(nchunks, chunk, N, 3)
    new_c = new_p.reshape(nchunks, chunk, M, 3)
    out = jax.lax.map(lambda ab: _ball_query_block(radius, nsample, ab[0], ab[1]), (xyz_c, new_c))
    return out.reshape(nchunks * chunk, M, nsample)[:B]
