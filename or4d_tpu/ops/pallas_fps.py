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


_CHUNK = 512  # ball-query chunk width (must match pallas_ball_query._CHUNK)


def _fps_counts_kernel(x_ref, y_ref, z_ref, out_ref, *count_refs, npoint: int, radii: tuple, n_valid: int, nch: int):
    """FPS + per-chunk ball-query hit counts in ONE pass.

    The FPS body already computes, at step j, the exact f32 direct-diff
    distances from query j-1 to every support point — precisely what the
    sub-tile-gated SA kernel's bounds pre-pass recomputed (40 ms at bench
    shapes). Emitting per-(query, 512-lane-chunk) hit counts per radius here
    makes the pre-pass FREE, and the counts are bit-exact against the main
    kernel's in-kernel distances (same subtraction up to sign, squares
    identical), so gate bounds derived from them are safe.

    count_refs[s]: (1, npoint, ROWS, nch) f32 — hit counts of query j in
    scan-order chunks (padded lanes excluded via n_valid masking).
    """
    x = x_ref[0]  # (ROWS, N)
    y = y_ref[0]
    z = z_ref[0]
    n = x.shape[1]
    mag = x * x + y * y + z * z
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    in_range = col < n_valid
    out_col = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape[1:], dimension=1)
    zero = jnp.zeros_like(x)
    # per-chunk sums as ONE tiny MXU matmul per scale (mask @ indicator):
    # 16 slice-sum reductions per step would be dispatch-bound on the VPU
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, nch), 0) // _CHUNK
    chid = jax.lax.broadcasted_iota(jnp.int32, (n, nch), 1)
    indicator = (lane == chid).astype(jnp.bfloat16)  # (N, nch)

    def emit_counts(j, d2):
        """Counts for the query selected at step j, whose distances are d2.
        0/1 bf16 mask, f32 accumulation: exact for counts <= CHUNK."""
        for s, radius in enumerate(radii):
            m = ((d2 < radius * radius) & in_range).astype(jnp.bfloat16)
            count_refs[s][0, j] = jax.lax.dot_general(
                m, indicator, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (ROWS, nch)

    def dist_from(sel):
        onehot = col == sel
        x0 = jnp.sum(jnp.where(onehot, x, zero), axis=1, keepdims=True)
        y0 = jnp.sum(jnp.where(onehot, y, zero), axis=1, keepdims=True)
        z0 = jnp.sum(jnp.where(onehot, z, zero), axis=1, keepdims=True)
        dx = x - x0
        dy = y - y0
        dz = z - z0
        return dx * dx + dy * dy + dz * dz

    def body(j, carry):
        mind, sel, outbuf = carry
        d2 = dist_from(sel)
        emit_counts(j - 1, d2)
        mind = jnp.minimum(mind, d2)
        best = jnp.max(mind, axis=1, keepdims=True)
        sel = jnp.min(jnp.where(mind == best, col, n), axis=1, keepdims=True).astype(jnp.int32)
        outbuf = jnp.where(out_col == j, sel, outbuf)
        return mind, sel, outbuf

    mind0 = jnp.where(mag > _MAG_EPS, jnp.float32(jnp.inf), jnp.float32(-1.0))
    sel0 = jnp.zeros((x.shape[0], 1), jnp.int32)
    out0 = jnp.zeros(out_ref.shape[1:], jnp.int32)
    mind, sel, outbuf = jax.lax.fori_loop(1, npoint, body, (mind0, sel0, out0))
    # the last selected query's distances never drive an update — one more
    # pass for its counts
    emit_counts(npoint - 1, dist_from(sel))
    out_ref[0] = outbuf


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def furthest_point_sample_with_counts(
    xyz: jax.Array, npoint: int, radii: tuple[float, ...], interpret: bool = False, rows: int = 16
) -> tuple[jax.Array, tuple[jax.Array, ...]]:
    """FPS indices + per-radius (B, npoint, nch) chunk hit counts, fused.

    Counts are for the FPS-ordered queries over scan-order 512-lane chunks
    (N padded up to a chunk multiple; padded lanes never counted)."""
    B, N, _ = xyz.shape
    rows = max(8, min(rows, _round_up(max(B, 1), 8)))
    Np = _round_up(max(N, 1), _CHUNK)
    nch = Np // _CHUNK
    Bp = _round_up(max(B, 1), rows)
    G = Bp // rows
    xyz = xyz.astype(jnp.float32)
    pad = ((0, Bp - B), (0, Np - N))
    x = jnp.pad(xyz[..., 0], pad).reshape(G, rows, Np)
    y = jnp.pad(xyz[..., 1], pad).reshape(G, rows, Np)
    z = jnp.pad(xyz[..., 2], pad).reshape(G, rows, Np)

    grid = (G,)
    spec = pl.BlockSpec((1, rows, Np), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, npoint, rows, nch), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM)
    out, *counts = pl.pallas_call(
        functools.partial(_fps_counts_kernel, npoint=npoint, radii=tuple(radii), n_valid=N, nch=nch),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=(pl.BlockSpec((1, rows, npoint), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                   *[cspec] * len(radii)),
        out_shape=(jax.ShapeDtypeStruct((G, rows, npoint), jnp.int32),
                   *[jax.ShapeDtypeStruct((G, npoint, rows, nch), jnp.float32)] * len(radii)),
        # the coords + counts + loop carries sit ~64K above the default 16M
        # scoped-vmem limit at rows=16, N=8192
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(x, y, z)
    idx = out.reshape(Bp, npoint)[:B]
    # (G, npoint, rows, nch) -> (B, npoint, nch)
    counts = tuple(
        jnp.transpose(c, (0, 2, 1, 3)).reshape(Bp, npoint, nch)[:B] for c in counts
    )
    return idx, counts


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
