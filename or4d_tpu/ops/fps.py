"""Furthest point sampling (FPS) — TPU-native.

Semantics mirror the reference CUDA kernel
(`pointnet2_ops/_ext-src/src/sampling_gpu.cu:69-173` in /root/reference):

  * the first selected index is always 0;
  * a running min-distance vector over all N points is maintained;
  * each step selects the point with the maximum running min-distance;
  * points with squared norm <= 1e-3 are skipped (never selected, never update
    the running distances) — the reference's near-origin quirk;
  * ties resolve to the lowest index (the CUDA tree reduction prefers the
    lower thread id on ties; `jnp.argmax` picks the first occurrence).

FPS is inherently sequential in ``npoint`` but fully parallel in N and batch,
so on TPU it is a `lax.fori_loop` of vectorized distance updates — the whole
working set (B, N) stays resident on-chip. A fused Pallas variant lives in
:mod:`or4d_tpu.ops.pallas_fps` and is used automatically on TPU for supported
shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_MAG_EPS = 1e-3  # reference: sampling_gpu.cu:100 "if (mag <= 1e-3) continue;"


@functools.partial(jax.jit, static_argnums=(1,))
def _fps_xla(xyz: jax.Array, npoint: int) -> jax.Array:
    """(B, N, 3) float -> (B, npoint) int32 FPS indices, XLA implementation."""
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    mag = jnp.sum(xyz * xyz, axis=-1)  # (B, N)
    valid = mag > _MAG_EPS

    def body(j, carry):
        mindist, old, idxs = carry
        last = jnp.take_along_axis(xyz, old[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((xyz - last) ** 2, axis=-1)  # (B, N)
        mindist = jnp.minimum(mindist, d)
        # invalid points can never win the argmax (reference skips them)
        masked = jnp.where(valid, mindist, -1.0)
        old = jnp.argmax(masked, axis=-1).astype(jnp.int32)  # (B,)
        idxs = idxs.at[:, j].set(old)
        return mindist, old, idxs

    idxs0 = jnp.zeros((B, npoint), dtype=jnp.int32)
    old0 = jnp.zeros((B,), dtype=jnp.int32)
    mind0 = jnp.full((B, N), jnp.inf, dtype=jnp.float32)
    _, _, idxs = jax.lax.fori_loop(1, npoint, body, (mind0, old0, idxs0))
    return idxs


def furthest_point_sample(xyz: jax.Array, npoint: int, *, use_pallas: str | bool = "auto") -> jax.Array:
    """Sample ``npoint`` indices from ``xyz`` (B, N, 3) by furthest-point sampling.

    Returns int32 indices of shape (B, npoint). Non-differentiable (indices).
    """
    if xyz.ndim != 3 or xyz.shape[-1] != 3:
        raise ValueError(f"furthest_point_sample expects (B, N, 3), got {xyz.shape}")
    if use_pallas is True or use_pallas == "auto":
        try:
            from or4d_tpu.ops.pallas_fps import fps_pallas_supported, furthest_point_sample_pallas

            if fps_pallas_supported(xyz.shape, npoint):
                return furthest_point_sample_pallas(xyz, npoint)
        except ImportError:
            pass
        if use_pallas is True:
            raise RuntimeError("Pallas FPS requested but unsupported for this shape/backend")
    return _fps_xla(xyz, npoint)


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather channels at sampled indices.

    ``points``: (B, C, N); ``idx``: (B, M) int -> (B, C, M).
    Equivalent of the reference `gather_operation` (sampling_gpu.cu:8-57);
    the scatter-add backward comes for free from JAX autodiff of the gather.
    """
    B, C, N = points.shape
    return jnp.take_along_axis(points, idx[:, None, :], axis=2)
