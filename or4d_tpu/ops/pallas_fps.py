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

_MAG_EPS = 1e-3
_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fps_kernel(x_ref, y_ref, z_ref, out_ref, npoint: int):
    """ROWS clouds per program as (ROWS, N) tiles riding the f32 sublanes.

    Pass-minimized step: validity is folded into the initial min-distance
    (invalid lanes start at -1 and, since squared distances are >= 0, can
    never win the running min), selection stays a (8, 1) vector (no
    vector->scalar crossings), and coordinates of the selection come from one
    one-hot mask reused across the three reductions.
    """
    x = x_ref[0]  # (ROWS, N)
    y = y_ref[0]
    z = z_ref[0]
    n = x.shape[1]
    mag = x * x + y * y + z * z
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape[1:], dimension=1)
    zero = jnp.zeros_like(x)

    def body(j, carry):
        mind, sel, outbuf = carry  # (8, N), (8, 1), (8, npoint)
        onehot = col == sel
        x0 = jnp.sum(jnp.where(onehot, x, zero), axis=1, keepdims=True)
        y0 = jnp.sum(jnp.where(onehot, y, zero), axis=1, keepdims=True)
        z0 = jnp.sum(jnp.where(onehot, z, zero), axis=1, keepdims=True)
        dx = x - x0
        dy = y - y0
        dz = z - z0
        mind = jnp.minimum(mind, dx * dx + dy * dy + dz * dz)
        best = jnp.max(mind, axis=1, keepdims=True)
        sel = jnp.min(jnp.where(mind == best, col, n), axis=1, keepdims=True).astype(jnp.int32)
        outbuf = jnp.where(out_col == j, sel, outbuf)
        return mind, sel, outbuf

    # invalid (mag <= 1e-3) lanes pinned to -1: they never update and never
    # win (reference skip quirk, sampling_gpu.cu:100)
    mind0 = jnp.where(mag > _MAG_EPS, jnp.float32(jnp.inf), jnp.float32(-1.0))
    sel0 = jnp.zeros((x.shape[0], 1), jnp.int32)
    out0 = jnp.zeros(out_ref.shape[1:], jnp.int32)
    _, _, outbuf = jax.lax.fori_loop(1, npoint, body, (mind0, sel0, out0))
    out_ref[0] = outbuf


def fps_pallas_supported(shape: tuple[int, ...], npoint: int) -> bool:
    """The kernel handles any (B, N, 3) by padding; gate on backend only."""
    return jax.default_backend() == "tpu" and npoint >= 1


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def furthest_point_sample_pallas(xyz: jax.Array, npoint: int, interpret: bool = False, rows: int = 16) -> jax.Array:
    """(B, N, 3) float -> (B, npoint) int32 FPS indices via the fused kernel.

    ``rows`` clouds share one grid program: each of the npoint sequential
    steps is overhead-bound (VPU dispatch + cross-lane reductions), so
    batching sublane rows amortizes it. On-chip A/B at 640x8000->512:
    rows=8 139.6 ms, 16 64.9, 32 85.3, 64 66.8 — 16 wins and is the
    default (8 was the original layout)."""
    B, N, _ = xyz.shape
    rows = max(8, min(rows, _round_up(max(B, 1), 8)))
    Np = _round_up(max(N, 1), _LANES)
    Bp = _round_up(max(B, 1), rows)
    G = Bp // rows
    xyz = xyz.astype(jnp.float32)
    pad = ((0, Bp - B), (0, Np - N))
    # (G, rows, Np) tiles per coordinate — rows clouds ride the f32 sublanes
    x = jnp.pad(xyz[..., 0], pad).reshape(G, rows, Np)
    y = jnp.pad(xyz[..., 1], pad).reshape(G, rows, Np)
    z = jnp.pad(xyz[..., 2], pad).reshape(G, rows, Np)

    grid = (G,)
    spec = pl.BlockSpec((1, rows, Np), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((1, rows, npoint), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, rows, npoint), jnp.int32),
        interpret=interpret,
    )(x, y, z)
    return out.reshape(Bp, npoint)[:B]
