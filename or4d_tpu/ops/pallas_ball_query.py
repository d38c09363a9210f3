"""Fused Pallas TPU ball-query kernel.

The XLA formulation (ops/ball_query.py) materializes the (B, M, N) distance
and key tensors in HBM and runs `top_k` over N — measured 371 ms for the SA1
relation-encoder shape (132x512 queries over 8000 points) on v5e, and 17 GB
of temporaries at scene_batch=8. This kernel keeps everything in VMEM:

  * distances by direct diff on the VPU — exactly the CUDA kernel's f32
    arithmetic (ball_query_gpu.cu:30-33), no matmul-expansion cancellation;
  * "first nsample in scan order" via an inclusive prefix-count of the
    within-radius mask (Hillis–Steele with `pltpu.roll`), then one masked
    reduction per output slot (the n-th hit is the unique lane whose running
    count equals n);
  * first-hit padding and the all-miss fallback exactly as the reference;
  * multi-scale fusion: all (radius, nsample) scales of one SA stage reuse a
    single distance tile.

Grid: (B, M/TM); per program a (TM, N) f32 tile lives in VMEM (TM=128,
N padded to a lane multiple).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TM = 128  # queries per program (index kernels)
_TM_G = 128  # queries per program for the fused grouping kernels; the
# feature planes + grouped outputs share VMEM with the distance tile, so the
# kernels declare an explicit 64MB VMEM budget (v5e has 128MB)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _prefix_count(mask_f: jax.Array, col: jax.Array, n: int) -> jax.Array:
    """Inclusive prefix sum along lanes via log-step shifted adds."""
    c = mask_f
    shift = 1
    while shift < n:
        rolled = pltpu.roll(c, shift, 1)
        c = c + jnp.where(col >= shift, rolled, 0.0)
        shift *= 2
    return c


def _make_kernel(scales: tuple[tuple[float, int], ...], n_valid: int):
    def kernel(qx_ref, qy_ref, qz_ref, x_ref, y_ref, z_ref, *out_refs):
        x = x_ref[0]  # (1, N)
        y = y_ref[0]
        z = z_ref[0]
        qx = qx_ref[0].reshape(_TM, 1)
        qy = qy_ref[0].reshape(_TM, 1)
        qz = qz_ref[0].reshape(_TM, 1)

        dx = qx - x
        dy = qy - y
        dz = qz - z
        d2 = dx * dx + dy * dy + dz * dz  # (TM, N)
        col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, dimension=1)
        in_range = col < n_valid

        for s, (radius, nsample) in enumerate(scales):
            mask = (d2 < radius * radius) & in_range
            c = _prefix_count(mask.astype(jnp.float32), col, d2.shape[1])
            # hit-rank at hit lanes (1-based), 0 elsewhere
            hitc = jnp.where(mask, c, 0.0).astype(jnp.int32)
            # total hits per row: one reduction replaces a per-slot has_k pass
            total = jnp.max(hitc, axis=1, keepdims=True)  # (TM, 1)

            cols = []
            first = None
            for k in range(1, nsample + 1):
                idx_k = jnp.sum(jnp.where(hitc == k, col, 0), axis=1, keepdims=True)  # (TM, 1)
                if first is None:
                    # slot 0 = first hit; 0 when the query has no hits (the
                    # reference leaves those slots uninitialized — in the
                    # PointNet++ pipeline queries are support points, so a
                    # zero-distance self-hit always exists)
                    first = idx_k
                    cols.append(idx_k)
                else:
                    cols.append(jnp.where(total >= k, idx_k, first))
            out_refs[s][0] = jnp.concatenate(cols, axis=1).astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 3))
def ball_query_multiscale_pallas(
    scales: tuple[tuple[float, int], ...],
    xyz: jax.Array,
    new_xyz: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, ...]:
    """Run all (radius, nsample) scales over one support/query set.

    ``xyz``: (B, N, 3); ``new_xyz``: (B, M, 3). Returns one (B, M, nsample)
    int32 index array per scale.
    """
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    Np = _round_up(N, 128)
    Mp = _round_up(M, _TM)
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)

    G = Mp // _TM
    # rank-3 layouts satisfying Mosaic block constraints (trailing block dims
    # equal the array dims): support (B, 1, Np); queries (B*G, 1, TM)
    sup = [jnp.pad(xyz[..., i], ((0, 0), (0, Np - N)))[:, None, :] for i in range(3)]
    qry = [
        jnp.pad(new_xyz[..., i], ((0, 0), (0, Mp - M))).reshape(B * G, 1, _TM) for i in range(3)
    ]

    grid = (B, G)
    qspec = pl.BlockSpec((1, 1, _TM), lambda b, m: (b * G + m, 0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1, Np), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM)
    out_specs = tuple(
        pl.BlockSpec((1, _TM, ns), lambda b, m: (b * G + m, 0, 0), memory_space=pltpu.VMEM) for _, ns in scales
    )
    out_shapes = tuple(jax.ShapeDtypeStruct((B * G, _TM, ns), jnp.int32) for _, ns in scales)

    outs = pl.pallas_call(
        _make_kernel(scales, N),
        grid=grid,
        in_specs=[qspec, qspec, qspec, sspec, sspec, sspec],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*qry, *sup)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    return tuple(o.reshape(B, Mp, -1)[:, :M, :] for o in outs)


def ball_query_pallas(radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array, interpret: bool = False) -> jax.Array:
    return ball_query_multiscale_pallas(((float(radius), int(nsample)),), xyz, new_xyz, interpret)[0]


# ---------------------------------------------------------------------------
# fused ball query + grouping: emit grouped features, never indices
# ---------------------------------------------------------------------------

def _make_group_kernel(scales: tuple[tuple[float, int], ...], n_valid: int):
    def kernel(qx_ref, qy_ref, qz_ref, x_ref, y_ref, z_ref, *rest):
        feat_refs = rest[: len(scales)]
        out_refs = rest[len(scales) :]
        x = x_ref[0]
        y = y_ref[0]
        z = z_ref[0]
        qx = qx_ref[0].reshape(_TM_G, 1)
        qy = qy_ref[0].reshape(_TM_G, 1)
        qz = qz_ref[0].reshape(_TM_G, 1)

        dx = qx - x
        dy = qy - y
        dz = qz - z
        d2 = dx * dx + dy * dy + dz * dz  # (TM, N)
        col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, dimension=1)
        in_range = col < n_valid

        for s, (radius, nsample) in enumerate(scales):
            A = feat_refs[s][0]  # (N, C) support features (layer-1 outputs)
            mask = (d2 < radius * radius) & in_range
            c = _prefix_count(mask.astype(jnp.float32), col, d2.shape[1])
            hitc = jnp.where(mask, c, 0.0).astype(jnp.int32)
            total = jnp.max(hitc, axis=1, keepdims=True)  # (TM, 1)

            first = None
            vals = []
            for k in range(1, nsample + 1):
                # one-hot slot selection as an MXU matmul: each output row is
                # exactly ONE row of A (no accumulation), so bf16 is exact
                sel = (hitc == k).astype(A.dtype)  # (TM, N)
                val = jnp.dot(sel, A, preferred_element_type=jnp.float32)  # (TM, C)
                if first is None:
                    first = val
                else:
                    val = jnp.where(total >= k, val, first)
                vals.append(val)
            out_refs[s][0] = jnp.stack(vals, axis=1).astype(out_refs[s].dtype)

    return kernel


def _make_group_bwd_kernel(scales: tuple[tuple[float, int], ...], n_valid: int):
    def kernel(qx_ref, qy_ref, qz_ref, x_ref, y_ref, z_ref, *rest):
        g_refs = rest[: len(scales)]
        dA_refs = rest[len(scales) :]
        x = x_ref[0]
        y = y_ref[0]
        z = z_ref[0]
        qx = qx_ref[0].reshape(_TM_G, 1)
        qy = qy_ref[0].reshape(_TM_G, 1)
        qz = qz_ref[0].reshape(_TM_G, 1)
        dx = qx - x
        dy = qy - y
        dz = qz - z
        d2 = dx * dx + dy * dy + dz * dz
        col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, dimension=1)
        in_range = col < n_valid

        # grid iterates the query tiles (m) fastest; the dA block for row b
        # stays resident, so zero it on the first tile and accumulate
        @pl.when(pl.program_id(1) == 0)
        def _():
            for r in dA_refs:
                r[0] = jnp.zeros_like(r[0])

        for s, (radius, nsample) in enumerate(scales):
            mask = (d2 < radius * radius) & in_range
            c = _prefix_count(mask.astype(jnp.float32), col, d2.shape[1])
            hitc = jnp.where(mask, c, 0.0).astype(jnp.int32)
            total = jnp.max(hitc, axis=1, keepdims=True)

            g = g_refs[s][0]  # (TM, ns, C)
            # first-hit padding routes the grads of unfilled slots to slot 1
            # (float masks: Mosaic cannot minor-dim-reshape booleans)
            slot_ids = jax.lax.broadcasted_iota(jnp.int32, (_TM_G, nsample), 1) + 1
            invalid_f = (slot_ids > total).astype(jnp.float32)  # (TM, ns)
            gf = g.astype(jnp.float32)
            g_eff_first = (
                g[:, 0, :].astype(jnp.float32)
                + jnp.sum(gf * invalid_f[:, :, None], axis=1)
                - gf[:, 0, :] * invalid_f[:, 0:1]
            )
            acc = jnp.zeros_like(dA_refs[s][0], dtype=jnp.float32)
            for k in range(1, nsample + 1):
                sel = (hitc == k).astype(jnp.float32)  # (TM, N)
                if k == 1:
                    gk = g_eff_first
                else:
                    gk = gf[:, k - 1, :] * (1.0 - invalid_f[:, k - 1 : k])
                # dA += sel^T @ gk, contraction over the TM axis on the MXU
                acc = acc + jax.lax.dot_general(
                    sel, gk, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            dA_refs[s][0] = dA_refs[s][0] + acc.astype(dA_refs[s].dtype)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4))
def ball_query_group_pallas(
    scales: tuple[tuple[float, int], ...],
    xyz: jax.Array,
    new_xyz: jax.Array,
    feats: tuple[jax.Array, ...],
    interpret: bool = False,
) -> tuple[jax.Array, ...]:
    """Fused first-k ball query + feature grouping.

    ``feats[s]``: (B, N, C_s) per-scale support features (the delayed-
    aggregation layer-1 outputs). Returns one (B, M, nsample_s, C_s) grouped
    tensor per scale with reference first-hit padding — equivalent to
    ball_query + take_along_axis but with no index tensors or HBM gathers.
    Differentiable in ``feats`` (scatter-style accumulation in the backward
    kernel, matching the torch grouping grad incl. duplicate-fill routing);
    geometry inputs are treated as non-differentiable, like the reference's
    int index path.
    """
    return _bqg_forward(scales, xyz, new_xyz, feats, interpret)


@functools.partial(jax.jit, static_argnums=(0, 4))
def _bqg_forward(
    scales: tuple[tuple[float, int], ...],
    xyz: jax.Array,
    new_xyz: jax.Array,
    feats: tuple[jax.Array, ...],
    interpret: bool = False,
) -> tuple[jax.Array, ...]:
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    Np = _round_up(N, 128)
    Mp = _round_up(M, _TM_G)
    G = Mp // _TM_G
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)

    sup = [jnp.pad(xyz[..., i], ((0, 0), (0, Np - N)))[:, None, :] for i in range(3)]
    qry = [jnp.pad(new_xyz[..., i], ((0, 0), (0, Mp - M))).reshape(B * G, 1, _TM_G) for i in range(3)]
    fpad = [jnp.pad(f, ((0, 0), (0, Np - N), (0, 0))) for f in feats]

    grid = (B, G)
    qspec = pl.BlockSpec((1, 1, _TM_G), lambda b, m: (b * G + m, 0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1, Np), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM)
    fspecs = [
        pl.BlockSpec((1, Np, f.shape[-1]), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM) for f in fpad
    ]
    out_specs = tuple(
        pl.BlockSpec((1, _TM_G, ns, f.shape[-1]), lambda b, m: (b * G + m, 0, 0, 0), memory_space=pltpu.VMEM)
        for (_, ns), f in zip(scales, feats)
    )
    out_shapes = tuple(
        jax.ShapeDtypeStruct((B * G, _TM_G, ns, f.shape[-1]), f.dtype) for (_, ns), f in zip(scales, feats)
    )

    outs = pl.pallas_call(
        _make_group_kernel(scales, N),
        grid=grid,
        in_specs=[qspec, qspec, qspec, sspec, sspec, sspec, *fspecs],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*qry, *sup, *fpad)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    return tuple(o.reshape(B, Mp, o.shape[2], o.shape[3])[:, :M] for o in outs)


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def _bqg_backward_impl(scales, xyz, new_xyz, gs, interpret, feat_shapes_dtypes):
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    Np = _round_up(N, 128)
    Mp = _round_up(M, _TM_G)
    G = Mp // _TM_G
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    sup = [jnp.pad(xyz[..., i], ((0, 0), (0, Np - N)))[:, None, :] for i in range(3)]
    qry = [jnp.pad(new_xyz[..., i], ((0, 0), (0, Mp - M))).reshape(B * G, 1, _TM_G) for i in range(3)]
    gpad = [
        jnp.pad(g, ((0, 0), (0, Mp - M), (0, 0), (0, 0))).reshape(B * G, _TM_G, g.shape[2], g.shape[3])
        for g in gs
    ]

    grid = (B, G)
    qspec = pl.BlockSpec((1, 1, _TM_G), lambda b, m: (b * G + m, 0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1, Np), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM)
    gspecs = [
        pl.BlockSpec((1, _TM_G, g.shape[2], g.shape[3]), lambda b, m: (b * G + m, 0, 0, 0), memory_space=pltpu.VMEM)
        for g in gpad
    ]
    out_specs = tuple(
        pl.BlockSpec((1, Np, c), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM)
        for (_n, c), _dt in feat_shapes_dtypes
    )
    out_shapes = tuple(
        jax.ShapeDtypeStruct((B, Np, c), jnp.float32) for (_n, c), _dt in feat_shapes_dtypes
    )
    outs = pl.pallas_call(
        _make_group_bwd_kernel(scales, N),
        grid=grid,
        in_specs=[qspec, qspec, qspec, sspec, sspec, sspec, *gspecs],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*qry, *sup, *gpad)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    return tuple(o[:, :N, :].astype(jnp.dtype(dt)) for o, ((_n, _c), dt) in zip(outs, feat_shapes_dtypes))


def _bqg_fwd(scales, xyz, new_xyz, feats, interpret):
    out = _bqg_forward(scales, xyz, new_xyz, feats, interpret)
    return out, (xyz, new_xyz)


def _bqg_bwd(scales, interpret, res, gs):
    xyz, new_xyz = res
    # feat shapes/dtypes are recoverable from the cotangents: the grouped
    # output carries the feature channel width and dtype
    feat_shapes_dtypes = tuple(((xyz.shape[1], g.shape[-1]), jnp.dtype(g.dtype).name) for g in gs)
    dA = _bqg_backward_impl(scales, xyz, new_xyz, tuple(gs), interpret, feat_shapes_dtypes)
    return jnp.zeros_like(xyz), jnp.zeros_like(new_xyz), dA


ball_query_group_pallas.defvjp(_bqg_fwd, _bqg_bwd)


def ball_query_multiscale(scales, xyz: jax.Array, new_xyz: jax.Array) -> tuple[jax.Array, ...]:
    """Dispatcher: fused Pallas kernel on TPU, XLA fallback elsewhere.

    ``scales``: ((radius, nsample), ...). Returns one (B, M, nsample_i) index
    array per scale.
    """
    scales = tuple((float(r), int(ns)) for r, ns in scales)
    if jax.default_backend() == "tpu":
        return ball_query_multiscale_pallas(scales, xyz, new_xyz)
    from or4d_tpu.ops.ball_query import ball_query

    return tuple(ball_query(r, ns, xyz, new_xyz) for r, ns in scales)
