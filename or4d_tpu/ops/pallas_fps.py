"""Fused Pallas TPU kernel for furthest point sampling.

FPS is sequential in ``npoint`` but parallel in batch and N. The XLA
`fori_loop` fallback (:mod:`or4d_tpu.ops.fps`) round-trips the (B, N)
min-distance carry through HBM every step; this kernel keeps x/y/z and the
running min-distances resident in VMEM for the whole selection loop.

Layout: the grid tiles the batch axis in groups of 8 clouds (the f32 sublane
count); within a program, each step is a handful of VPU passes over
(8, N) lanes — distance update, running-min, masked row-argmax — and the
current selection is materialized with a one-hot masked reduction instead of
scalar gathers.

Zero-padded points have squared norm 0 <= 1e-3 and are therefore skipped by
the reference's own `mag <= 1e-3` quirk (sampling_gpu.cu:100), so padding N
up to a lane multiple needs no extra masking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_B_TILE = 8
_MAG_EPS = 1e-3


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fps_kernel(x_ref, y_ref, z_ref, out_ref, npoint: int):
    x = x_ref[:]  # (8, N)
    y = y_ref[:]
    z = z_ref[:]
    n = x.shape[1]
    mag = x * x + y * y + z * z
    valid = mag > _MAG_EPS
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (_B_TILE, npoint), dimension=1)

    def body(j, carry):
        # Mosaic cannot lane-slice stores at dynamic offsets, so the output
        # buffer rides the carry and is committed with one full-width store.
        mind, sel, outbuf = carry  # (8, N), (8, 1), (8, npoint)
        onehot = col == sel  # (8, N)
        zero = jnp.zeros_like(x)
        x0 = jnp.sum(jnp.where(onehot, x, zero), axis=1, keepdims=True)
        y0 = jnp.sum(jnp.where(onehot, y, zero), axis=1, keepdims=True)
        z0 = jnp.sum(jnp.where(onehot, z, zero), axis=1, keepdims=True)
        dx = x - x0
        dy = y - y0
        dz = z - z0
        d = dx * dx + dy * dy + dz * dz
        mind = jnp.minimum(mind, d)
        mval = jnp.where(valid, mind, -1.0)
        best = jnp.max(mval, axis=1, keepdims=True)
        # first index achieving the row max (reference tie-break: lowest index)
        sel = jnp.min(jnp.where(mval == best, col, n), axis=1, keepdims=True).astype(jnp.int32)
        outbuf = jnp.where(out_col == j, sel, outbuf)
        return mind, sel, outbuf

    mind0 = jnp.full(x.shape, jnp.inf, dtype=jnp.float32)
    sel0 = jnp.zeros((_B_TILE, 1), jnp.int32)
    out0 = jnp.zeros((_B_TILE, npoint), jnp.int32)
    _, _, outbuf = jax.lax.fori_loop(1, npoint, body, (mind0, sel0, out0))
    out_ref[:] = outbuf


def fps_pallas_supported(shape: tuple[int, ...], npoint: int) -> bool:
    """The kernel handles any (B, N, 3) by padding; gate on backend only."""
    return jax.default_backend() == "tpu" and npoint >= 1


@functools.partial(jax.jit, static_argnums=(1, 2))
def furthest_point_sample_pallas(xyz: jax.Array, npoint: int, interpret: bool = False) -> jax.Array:
    """(B, N, 3) float -> (B, npoint) int32 FPS indices via the fused kernel."""
    B, N, _ = xyz.shape
    Bp = _round_up(max(B, 1), _B_TILE)
    Np = _round_up(max(N, 1), 128)
    xyz = xyz.astype(jnp.float32)
    pad = ((0, Bp - B), (0, Np - N))
    x = jnp.pad(xyz[..., 0], pad)
    y = jnp.pad(xyz[..., 1], pad)
    z = jnp.pad(xyz[..., 2], pad)

    grid = (Bp // _B_TILE,)
    spec = pl.BlockSpec((_B_TILE, Np), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((_B_TILE, npoint), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, npoint), jnp.int32),
        interpret=interpret,
    )(x, y, z)
    return out[:B]
