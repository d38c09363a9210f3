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


_CHUNK = 512  # lanes per chunk for the MXU prefix / gated selection


def _prefix_count_mxu(d2: jax.Array, r2: float, tri: jax.Array):
    """Inclusive prefix count along lanes via chunked triangular matmuls.

    The Hillis–Steele scan costs ~13 full-width VPU passes; here each
    512-lane chunk's local prefix is ONE (TM, 512) @ (512, 512) matmul on the
    otherwise-idle MXU (0/1 bf16 inputs, f32 accumulation — exact), plus a
    tiny cross-chunk scan. The radius mask is formed per chunk from the d2
    slice so no full-width mask stays live in VMEM. Returns (per-chunk LOCAL
    prefixes, exclusive chunk offsets (TM, nch), inclusive boundary counts
    (TM, nch))."""
    n = d2.shape[1]
    nch = n // _CHUNK
    locals_ = []
    tots = []
    for ch in range(nch):
        m = (d2[:, ch * _CHUNK : (ch + 1) * _CHUNK] < r2).astype(tri.dtype)
        loc = jax.lax.dot_general(
            m, tri, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TM, CHUNK) inclusive local prefix
        locals_.append(loc)
        tots.append(loc[:, _CHUNK - 1 : _CHUNK])
    tot = jnp.concatenate(tots, axis=1)  # (TM, nch) per-chunk totals
    # inclusive scan over the (tiny) chunk axis, then exclusive offsets
    c = tot
    colc = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
    shift = 1
    while shift < nch:
        c = c + jnp.where(colc >= shift, pltpu.roll(c, shift, 1), 0.0)
        shift *= 2
    excl = c - tot  # (TM, nch) exclusive chunk offsets
    return locals_, excl, c


def _tri_inclusive(dtype, n: int = _CHUNK):
    """(n, n) lower-triangular-transpose ones: tri[j, i] = j <= i."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r <= cidx).astype(dtype)


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


def _make_bounds_kernel(
    scales: tuple[tuple[float, int], ...], nch: int, tm: int, rb: int, count_mode: str
):
    """Light pre-pass for the sub-tile-gated kernel: distances + per-chunk hit
    counts only (no rank planes). Emits per query and scale: ``need``
    (exclusive chunk bound covering the min(nsample,total)-th hit) and
    ``total`` (hit count). Only the query ORDER consumes these (the main
    kernel recomputes its gate bounds exactly), but the arithmetic is the
    main kernel's f32 direct-diff, so the keys are exact anyway.

    count_mode selects the per-chunk reduction: "lanesum" (VPU log-tree,
    ~2.3us per (512,512) tile) or "matmul" (mask @ ones on the MXU).
    An XLA norm-expansion formulation of this pass measured 58 ms at bench
    shapes — the f32 cross-term HBM round-trip is its floor; VMEM-resident
    Pallas is the right structure.

    Distances ride the MXU as [-2q | 1] @ [p ; |p|^2] (default-precision f32
    ~ 1e-6 relative — the main kernel recomputes its gate bounds with exact
    direct-diff arithmetic, so an epsilon-level hit flip here only perturbs
    the query ORDER); the VPU direct-diff form costs ~8 full-tile passes per
    chunk and dominated the 40 ms round-3 pre-pass."""

    def kernel(qx_ref, qy_ref, qz_ref, x_ref, y_ref, z_ref, *out_refs):
        ones = jnp.ones((_CHUNK, 8), jnp.bfloat16)
        for r in range(rb):
            qx = qx_ref[r].reshape(tm, 1)
            qy = qy_ref[r].reshape(tm, 1)
            qz = qz_ref[r].reshape(tm, 1)
            qn2 = qx * qx + qy * qy + qz * qz  # (TM, 1)
            q4 = jnp.concatenate(
                [-2.0 * qx, -2.0 * qy, -2.0 * qz, jnp.ones_like(qx)], axis=1
            )  # (TM, 4)
            counts = [[] for _ in scales]  # per scale, per chunk (TM, 1)
            for ch in range(nch):
                x = x_ref[r, ch]  # (1, CHUNK)
                y = y_ref[r, ch]
                z = z_ref[r, ch]
                p4 = jnp.concatenate([x, y, z, x * x + y * y + z * z], axis=0)  # (4, CHUNK)
                d2 = (
                    jax.lax.dot_general(
                        q4, p4, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    + qn2
                )  # (TM, CHUNK) = |q|^2 - 2 q.p + |p|^2
                for s, (radius, _ns) in enumerate(scales):
                    if count_mode == "matmul":
                        m = (d2 < radius * radius).astype(jnp.bfloat16)
                        c = jax.lax.dot_general(
                            m, ones, dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )[:, 0:1]
                    else:
                        m = (d2 < radius * radius).astype(jnp.float32)
                        c = jnp.sum(m, axis=1, keepdims=True)
                    counts[s].append(c)
            for s, (_radius, nsample) in enumerate(scales):
                tot = jnp.concatenate(counts[s], axis=1)  # (TM, nch)
                bnd = tot
                colc = jax.lax.broadcasted_iota(jnp.int32, bnd.shape, 1)
                shift = 1
                while shift < nch:
                    bnd = bnd + jnp.where(colc >= shift, pltpu.roll(bnd, shift, 1), 0.0)
                    shift *= 2
                total = bnd[:, nch - 1 : nch]  # (TM, 1)
                thr = jnp.minimum(total, float(nsample))
                need = jnp.sum((bnd < thr).astype(jnp.float32), axis=1, keepdims=True) + 1.0
                out_refs[s][r] = jnp.concatenate([need, total], axis=1)  # (TM, 2)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def ball_query_bounds_pallas(
    scales: tuple[tuple[float, int], ...],
    xyz: jax.Array,
    new_xyz: jax.Array,
    interpret: bool = False,
    rows_per_program: int = 1,
    # lanesum: with the norm-expansion distance matmul on the MXU, VPU
    # log-tree counts overlap it (35.7 ms); interleaving a second matmul
    # shape for the counts measured 63 ms
    count_mode: str = "lanesum",
) -> tuple[tuple[jax.Array, jax.Array], ...]:
    """Per scale: (need (B, M) — exclusive chunk-scan bound, total (B, M))."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    Np = _round_up(N, _CHUNK)
    nch = Np // _CHUNK
    tm = min(512, _round_up(M, 128))
    Mp = _round_up(M, tm)
    G = Mp // tm
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    rb = rows_per_program if (G == 1 and B % rows_per_program == 0) else 1
    sup = [
        jnp.pad(xyz[..., i], ((0, 0), (0, Np - N)), constant_values=1e12).reshape(B, nch, 1, _CHUNK)
        for i in range(3)
    ]
    if G > 1:  # rb==1: one (row, query-tile) pair per program
        sup = [jnp.repeat(s, G, axis=0) for s in sup]
    qry = [jnp.pad(new_xyz[..., i], ((0, 0), (0, Mp - M))).reshape(B * G, 1, tm) for i in range(3)]
    grid = ((B * G) // rb,)
    qspec = pl.BlockSpec((rb, 1, tm), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((rb, nch, 1, _CHUNK), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    out_specs = tuple(
        pl.BlockSpec((rb, tm, 2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM) for _ in scales
    )
    out_shapes = tuple(jax.ShapeDtypeStruct((B * G, tm, 2), jnp.float32) for _ in scales)
    outs = pl.pallas_call(
        _make_bounds_kernel(scales, nch, tm, rb, count_mode),
        grid=grid,
        in_specs=[qspec, qspec, qspec, sspec, sspec, sspec],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*qry, *sup)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    res = []
    for o in outs:
        o = o.reshape(B, Mp, 2)
        res.append((o[:, :M, 0], o[:, :M, 1]))
    return tuple(res)


def _subtile_order_key(
    scales: tuple[tuple[float, int], ...], xyz: jax.Array, new_xyz: jax.Array, interpret: bool = False
) -> jax.Array:
    """Composite query-ordering key for the sub-tile-gated kernel.

    Per scale: dense queries (total >= nsample) key by their chunk-scan
    crossing bound, stragglers sort after them by hit count; the costliest
    scale (largest nsample) keys first."""
    bounds = ball_query_bounds_pallas(scales, xyz, new_xyz, interpret)
    keys = [
        jnp.where(tot >= ns, need, 1000.0 + tot)
        for (_r, ns), (need, tot) in zip(scales, bounds)
    ]
    prio = sorted(range(len(scales)), key=lambda s: -scales[s][1])
    key = jnp.zeros_like(keys[0])
    for depth, s in enumerate(prio):
        key = key + keys[s] * (2048.0 ** (len(prio) - 1 - depth))
    return key


def bounds_order_key_argsort(scales, bounds) -> jax.Array:
    """Composite query order from exact bounds (the pre-pass path's formula):
    dense queries ascending by chunks-needed, stragglers after them ascending
    by hit count; the costliest scale (largest nsample) keys first."""
    keys = [
        jnp.where(thr >= float(ns), need, 1000.0 + thr)
        for (_r, ns), (need, thr) in zip(scales, bounds)
    ]
    prio = sorted(range(len(scales)), key=lambda s: -scales[s][1])
    key = jnp.zeros_like(keys[0])
    for depth, s in enumerate(prio):
        key = key + keys[s] * (2048.0 ** (len(prio) - 1 - depth))
    return jnp.argsort(key, axis=1)


def _counts_to_bounds(
    scales: tuple[tuple[float, int], ...], counts: tuple[jax.Array, ...]
) -> tuple[tuple[jax.Array, jax.Array], ...]:
    """Per-chunk hit counts (B, M, nch) -> per scale (need, thr) with
    need = chunks covering the min(nsample, total)-th hit (exclusive scan
    bound) and thr = min(nsample, total). Bit-exact against the main
    kernel's in-kernel arithmetic when the counts come from
    `furthest_point_sample_with_counts` (identical f32 direct-diff)."""
    out = []
    for (_r, ns), c in zip(scales, counts):
        cum = jnp.cumsum(c, axis=-1)  # (B, M, nch)
        total = cum[..., -1]
        thr = jnp.minimum(total, float(ns))
        need = jnp.sum((cum < thr[..., None]).astype(jnp.float32), axis=-1) + 1.0
        out.append((need, thr))
    return tuple(out)


# ---------------------------------------------------------------------------
# inference-fused: ball query + grouping + folded-BN MLP + slot maxpool
# ---------------------------------------------------------------------------


def _make_group_mlp_kernel_v4(
    scales: tuple[tuple[float, int], ...],
    tm: int,
    subtile: int,
    nch: int,
    pair_chunks: bool = False,
    from_raw: bool = False,
):
    """Two-gate sub-tiled eval SA kernel, lazy-everything variant.

    The round-3 kernel built full-width d2 tiles and rank planes for ALL
    chunks up front (~70 ms of the 211 ms at 640 rows — probe data in
    PERF.md) and recomputed its gate bounds from them. Here the bounds
    arrive as INPUTS (exact, a free byproduct of the FPS kernel —
    pallas_fps.furthest_point_sample_with_counts), so distances, triangular
    prefixes and rank planes are built per chunk INSIDE the gated loops with
    a running hit-count carry: every fixed cost now scales with the chunks
    actually scanned.

    Per scale, bounds_ref carries (tm, 2) = [need, thr] per sorted query:
    need = chunk-prefix bound covering the min(ns, total)-th hit, thr =
    min(ns, total). Correctness does not depend on the query ORDER (bounds
    are exact per query); order only affects tile homogeneity.

    pair_chunks: fuse chunk pairs in the selection dots (k = 2*CHUNK) —
    halves the per-unit dispatch overhead at the cost of chunk-pair gate
    granularity. Requires even nch.

    from_raw: the per-scale A operand is a LAYER-1 WEIGHT matrix (C0p, C1)
    and one shared raw [xyz|feat] plane (B, nchA, stepCHUNK, C0p) rides in
    after the bounds; each program computes its A planes in VMEM (one tiny
    (stepCHUNK, C0p) @ (C0p, C1) matmul per chunk — identical bf16-input
    f32-accumulate arithmetic to the XLA dense it replaces), so the multi-GB
    HBM A planes never exist. ~38 GFLOP of recompute per bench batch vs
    ~10 GB of HBM traffic saved.
    """
    S = len(scales)
    PC = _CHUNK // 2
    halves = _CHUNK // PC
    step = 2 if pair_chunks else 1  # chunks per gated iteration

    def kernel(qx_ref, qy_ref, qz_ref, x_ref, y_ref, z_ref, *rest):
        A_refs = rest[0:S]  # from_raw: per-scale W0 (1, C0p, C1)
        bq_refs = rest[S : 2 * S]
        a0_refs = rest[2 * S : 3 * S]
        b0_refs = rest[3 * S : 4 * S]
        w1_refs = rest[4 * S : 5 * S]
        a1_refs = rest[5 * S : 6 * S]
        b1_refs = rest[6 * S : 7 * S]
        bounds_refs = rest[7 * S : 8 * S]
        nin = 8 * S + (1 if from_raw else 0)
        raw_ref = rest[8 * S] if from_raw else None  # (1, C0, nchA, stepCHUNK)
        out_refs = rest[nin : nin + S]
        rank_ref = rest[nin + S]  # (nch, subtile, CHUNK) f32 scratch (slot path)
        if from_raw:
            a_scr_refs = rest[nin + S + 1 : nin + 2 * S + 1]  # (nchA, stepCHUNK, C1)
            acc_refs = rest[nin + 2 * S + 1 :]  # per scale (ns, tm, C1) f32
        else:
            acc_refs = rest[nin + S + 1 :]  # per scale (ns, tm, C1) f32

        tri = _tri_inclusive(jnp.bfloat16, PC)
        qx = qx_ref[0].reshape(tm, 1)
        qy = qy_ref[0].reshape(tm, 1)
        qz = qz_ref[0].reshape(tm, 1)

        def chunk_ranks(ch, rs, carry, r2):
            """d2 + half-chunk tri prefix for chunk ch, rows rs; returns
            (rank plane (subtile, CHUNK) — global rank at hits, 0 at
            non-hits, given carry = hits before this chunk — and the new
            carry)."""
            dx = qx[rs] - x_ref[0, ch]
            dy = qy[rs] - y_ref[0, ch]
            dz = qz[rs] - z_ref[0, ch]
            d2 = dx * dx + dy * dy + dz * dz  # (subtile, CHUNK)
            parts = []
            off = carry
            for hf in range(halves):
                mh = d2[:, hf * PC : (hf + 1) * PC] < r2
                loc = jax.lax.dot_general(
                    mh.astype(tri.dtype), tri, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                parts.append(jnp.where(mh, loc + off, 0.0))
                off = off + loc[:, PC - 1 : PC]
            return jnp.concatenate(parts, axis=1), off

        for s, (radius, nsample) in enumerate(scales):
            acc_ref = acc_refs[s]
            A_dtype = A_refs[s].dtype
            C1 = acc_ref.shape[-1]
            if from_raw:
                # materialize this scale's A plane in VMEM from the shared
                # channel-major raw plane: bf16 inputs, f32 accumulation,
                # bf16 store — the same arithmetic as the XLA dense it
                # replaces (contraction over the C0 sublane dim, the proven
                # sel^T-style transposed-LHS pattern)
                W0 = A_refs[s][0]
                for cp in range(raw_ref.shape[2]):
                    a_scr_refs[s][cp] = jax.lax.dot_general(
                        raw_ref[0, :, cp], W0,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(A_dtype)
                A_get = lambda cp, s=s: a_scr_refs[s][cp]
            else:
                A_get = lambda cp, A_ref=A_refs[s]: A_ref[0, cp]
            r2s = radius * radius
            Bq = bq_refs[s][0].astype(jnp.float32)
            a0 = a0_refs[s][0].astype(jnp.float32)
            b0 = b0_refs[s][0].astype(jnp.float32)
            W1 = w1_refs[s][0]
            a1 = a1_refs[s][0].astype(jnp.float32)
            b1 = b1_refs[s][0].astype(jnp.float32)
            bounds = bounds_refs[s][0]  # (tm, 2) [need, thr]

            for r0 in range(0, tm, subtile):
                rs = slice(r0, r0 + subtile)
                needv = bounds[rs, 0:1]
                thrv = bounds[rs, 1:2]
                h = jnp.minimum(jnp.max(needv), float(nch)).astype(jnp.int32)
                hp = (h + (step - 1)) // step  # gated iterations
                cap = jnp.maximum(jnp.max(thrv), 1.0).astype(jnp.int32)
                use_chunk = h * nsample <= cap * nch

                @pl.when(use_chunk)
                def _chunk_gate(rs=rs, hp=hp, A_get=A_get, acc_ref=acc_ref, r2s=r2s):
                    for k in range(nsample):
                        acc_ref[k, rs] = jnp.zeros((subtile, C1), jnp.float32)

                    def body(cp, carry):
                        if step == 2:
                            r1, carry = chunk_ranks(2 * cp, rs, carry, r2s)
                            r2_, carry = chunk_ranks(2 * cp + 1, rs, carry, r2s)
                            rank = jnp.concatenate([r1, r2_], axis=1)
                        else:
                            rank, carry = chunk_ranks(cp, rs, carry, r2s)
                        a_ch = A_get(cp)
                        for k in range(1, nsample + 1):
                            sel = (rank == float(k)).astype(A_dtype)
                            acc_ref[k - 1, rs] += jax.lax.dot_general(
                                sel, a_ch, dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                        return carry

                    jax.lax.fori_loop(0, hp, body, jnp.zeros((subtile, 1), jnp.float32))

                @pl.when(jnp.logical_not(use_chunk))
                def _slot_gate(rs=rs, cap=cap, A_get=A_get, acc_ref=acc_ref, r2s=r2s):
                    # stragglers: every hit is selected (total < ns), hits
                    # spread across scan order — build ALL rank planes once
                    # (static unroll, running carry), then loop real slots
                    carry = jnp.zeros((subtile, 1), jnp.float32)
                    for ch in range(nch):
                        rank_ref[ch], carry = chunk_ranks(ch, rs, carry, r2s)

                    def body(i, c):
                        kf = (i + 1).astype(jnp.float32)
                        acc = None
                        for cp in range(nch // step):
                            if step == 2:
                                sel_plane = jnp.concatenate(
                                    [rank_ref[2 * cp], rank_ref[2 * cp + 1]], axis=1
                                )
                            else:
                                sel_plane = rank_ref[cp]
                            sel = (sel_plane == kf).astype(A_dtype)
                            d = jax.lax.dot_general(
                                sel, A_get(cp), dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            acc = d if acc is None else acc + d
                        acc_ref[i, rs] = acc
                        return c

                    jax.lax.fori_loop(0, cap, body, 0)

            # epilogue at full tile width (identical to the round-3 kernel):
            # first-hit fill via thr >= k (padded slots duplicate slot 1 —
            # the max is unchanged), folded-BN MLP, slot maxpool
            thr_full = bounds[:, 1:2]
            best = None
            first = None
            for k in range(1, nsample + 1):
                val = acc_ref[k - 1]
                if first is None:
                    first = val
                else:
                    val = jnp.where(thr_full >= float(k), val, first)
                hmid = jnp.maximum((val - Bq) * a0 + b0, 0.0)
                hw = jnp.dot(hmid.astype(W1.dtype), W1, preferred_element_type=jnp.float32)
                o = jnp.maximum(hw * a1 + b1, 0.0)
                best = o if best is None else jnp.maximum(best, o)
            out_refs[s][0] = best.astype(out_refs[s].dtype)

    return kernel

def _make_group_mlp_kernel(
    scales: tuple[tuple[float, int], ...],
    n_valid: int,
    tm: int,
    gate_chunks: bool = False,
    subtile: int = 0,
    debug_bounds: tuple[int, int] | None = None,
):
    """Per scale, consume (A, Bq, a0, b0, W1, a1, b1) and emit the SA scale
    output max_k relu(a1*(relu(a0*(val_k - Bq) + b0) @ W1) + b1) directly —
    grouped tensors never leave VMEM. First-hit-fill padding is dropped: the
    padded slots duplicate slot 1's value, which cannot change the max, so
    the result equals the unfused eval path exactly (up to reassociation).

    Chunk gating: first-hit semantics means every slot's hit lives in the
    scan-order PREFIX up to the chunk where the query's cumulative hit count
    reaches nsample. The prefix pass yields that chunk per query for free;
    the expensive per-slot compare+selection work runs in ONE dynamic
    fori_loop bounded by the TILE's worst query (callers density-sort
    queries so tiles are homogeneous and stragglers share the last tiles).
    Selections accumulate into per-slot f32 tiles — each slot's one-hot row
    lives in exactly one chunk, so the sum is the exact selected row."""
    S = len(scales)

    def kernel(qx_ref, qy_ref, qz_ref, x_ref, y_ref, z_ref, *rest):
        A_refs = rest[0:S]
        bq_refs = rest[S : 2 * S]
        a0_refs = rest[2 * S : 3 * S]
        b0_refs = rest[3 * S : 4 * S]
        w1_refs = rest[4 * S : 5 * S]
        a1_refs = rest[5 * S : 6 * S]
        b1_refs = rest[6 * S : 7 * S]
        out_refs = rest[7 * S : 8 * S]
        d2_ref = rest[8 * S]     # VMEM scratch (nch, TM, CHUNK) f32
        rank_ref = rest[8 * S + 1]  # VMEM scratch (nch, TM, CHUNK) f32, chunk-major
        acc_refs = rest[8 * S + 2 : 8 * S + 2 + S]  # (ns_s, TM, C1_s) f32

        qx = qx_ref[0].reshape(tm, 1)
        qy = qy_ref[0].reshape(tm, 1)
        qz = qz_ref[0].reshape(tm, 1)
        nch = d2_ref.shape[0]
        # local prefixes run on PC-lane half-chunks: the triangular-matmul
        # cost is nhalves * TM * PC^2 = TM * N * PC — LINEAR in the prefix
        # width — while gating/selection keep their 512-lane granularity
        # (rank planes are assembled per half with half-granular offsets)
        # PC=256 measured best (206 ms): PC=128's extra dot-issue overhead
        # costs more than its tri savings (209 ms + a VMEM bump), PC=512
        # (round-2 state) pays double tri (217 ms)
        PC = _CHUNK // 2
        halves = _CHUNK // PC
        tri = _tri_inclusive(jnp.bfloat16, PC)
        # chunk-major distance tiles; padded support lanes carry poison
        # coords (wrapper), so no lane-index masking is needed anywhere.
        # (A norm-expansion variant with the 3-wide cross term on the MXU
        # at HIGHEST precision measured SLOWER: 284 ms vs 263 at bench
        # shapes — the tiny-K 3-pass f32 matmul is overhead-bound.)
        for ch in range(nch):
            dx = qx - x_ref[0, ch]
            dy = qy - y_ref[0, ch]
            dz = qz - z_ref[0, ch]
            d2_ref[ch] = dx * dx + dy * dy + dz * dz

        for s, (radius, nsample) in enumerate(scales):
            A_ref = A_refs[s]  # (1, nch, CHUNK, C1)
            acc_ref = acc_refs[s]
            A_dtype = A_ref.dtype
            Bq = bq_refs[s][0].astype(jnp.float32)  # (TM, C1)
            a0 = a0_refs[s][0].astype(jnp.float32)  # (1, C1)
            b0 = b0_refs[s][0].astype(jnp.float32)
            W1 = w1_refs[s][0]  # (C1, C2)
            a1 = a1_refs[s][0].astype(jnp.float32)  # (1, C2)
            b1 = b1_refs[s][0].astype(jnp.float32)

            r2 = radius * radius
            # half-chunk-local prefixes via MXU triangular matmuls (0/1 bf16
            # inputs, f32 accumulation — exact); the tiny cross-half scan
            # turns them into global hit ranks, stored chunk-major (0 at
            # non-hits) so the gated loop can index chunks dynamically
            tots = []
            locs = []
            for ch in range(nch):
                d2c = d2_ref[ch]
                pairs = []
                for hf in range(halves):
                    mh = d2c[:, hf * PC : (hf + 1) * PC] < r2
                    loc = jax.lax.dot_general(
                        mh.astype(tri.dtype), tri, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    pairs.append((mh, loc))
                    tots.append(loc[:, PC - 1 : PC])
                locs.append(pairs)
            nh = nch * halves
            tot = jnp.concatenate(tots, axis=1)  # (TM, nh)
            bnd = tot
            shift = 1
            colc = jax.lax.broadcasted_iota(jnp.int32, bnd.shape, 1)
            while shift < nh:
                bnd = bnd + jnp.where(colc >= shift, pltpu.roll(bnd, shift, 1), 0.0)
                shift *= 2
            excl = bnd - tot  # exclusive half-chunk offsets
            for ch, pairs in enumerate(locs):  # global rank at hits, 0 at non-hits
                rank_ref[ch] = jnp.concatenate(
                    [
                        jnp.where(mh, loc + excl[:, ch * halves + hf : ch * halves + hf + 1], 0.0)
                        for hf, (mh, loc) in enumerate(pairs)
                    ],
                    axis=1,
                )
            total = bnd[:, nh - 1 : nh]  # (TM, 1)

            # per-slot compare + dot per chunk: measured FASTER than fusing
            # the ns selections into one (ns*TM, CHUNK) matmul (410 ms vs
            # 263 at bench shapes — the wide operand breaks Mosaic's tiling)
            if subtile:
                # Two-gate sub-tiling: each SUBTILE-row group independently
                # picks the cheaper of (a) chunk-gating — scan only the
                # prefix of chunks covering every row's min(ns, total)-th
                # hit, all ns slots unrolled — and (b) slot-gating — compute
                # only max(total) slots, all chunks unrolled; the remaining
                # slots are first-hit fill, which the epilogue's
                # ``total >= k`` select reconstructs without reading the
                # (unwritten) accumulator rows. Callers order queries by the
                # bounds pre-pass so tiles are homogeneous; bounds here are
                # recomputed exactly, so ANY order is correct.
                thr = jnp.minimum(total, float(nsample))  # (TM, 1)
                # crossing half-chunk (1-based) -> covering CHUNK count
                needv = jnp.sum((bnd < thr).astype(jnp.float32), axis=1, keepdims=True) + 1.0
                needv = jnp.ceil(needv / halves)
                acc_ref = acc_refs[s]
                C1 = acc_ref.shape[-1]
                for r0 in range(0, tm, subtile):
                    rs = slice(r0, r0 + subtile)
                    h = jnp.minimum(jnp.max(needv[rs]), float(nch)).astype(jnp.int32)
                    cap = jnp.maximum(jnp.max(thr[rs]), 1.0).astype(jnp.int32)
                    use_chunk = h * nsample <= cap * nch
                    if debug_bounds is not None:
                        # measurement-only override (WRONG results): pin the
                        # gate bounds to constants to separate per-iteration
                        # loop overhead from per-unit selection work
                        dh, dc = debug_bounds
                        if dh:
                            h = jnp.int32(dh)
                            use_chunk = h >= 0  # always chunk path
                        else:
                            cap = jnp.int32(dc)
                            use_chunk = cap < 0  # always slot path

                    @pl.when(use_chunk)
                    def _chunk_gate(rs=rs, h=h, A_ref=A_ref, acc_ref=acc_ref):
                        for k in range(nsample):
                            acc_ref[k, rs] = jnp.zeros((subtile, C1), jnp.float32)

                        # per-slot compare+dot at m=subtile. (Two batching
                        # rewrites measured NO better on-chip: stacking the
                        # ns selections into one (ns*subtile, CHUNK) matmul
                        # via a staging buffer = 219 ms, and full-width
                        # (subtile, Np) per-slot contractions off a rank
                        # mirror = 225 ms + a 114MB VMEM budget, vs 217 ms
                        # for this form — Mosaic already pipelines the small
                        # matmul sequences well.)
                        def body(ch, carry):
                            rank = rank_ref[ch, rs]
                            a_ch = A_ref[0, ch]
                            for k in range(1, nsample + 1):
                                sel = (rank == float(k)).astype(A_dtype)
                                acc_ref[k - 1, rs] += jax.lax.dot_general(
                                    sel, a_ch, dimension_numbers=(((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                )
                            return carry

                        jax.lax.fori_loop(0, h, body, 0)

                    @pl.when(jnp.logical_not(use_chunk))
                    def _slot_gate(rs=rs, cap=cap, A_ref=A_ref, acc_ref=acc_ref):
                        # straggler tiles: compute only the real slots; hits
                        # are spread across scan order, so chunks unroll
                        def body(i, carry):
                            kf = (i + 1).astype(jnp.float32)
                            acc = None
                            for ch in range(nch):
                                sel = (rank_ref[ch, rs] == kf).astype(A_dtype)
                                d = jax.lax.dot_general(
                                    sel, A_ref[0, ch], dimension_numbers=(((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                )
                                acc = d if acc is None else acc + d
                            acc_ref[i, rs] = acc
                            return carry

                        jax.lax.fori_loop(0, cap, body, 0)

                vals = [acc_ref[k] for k in range(nsample)]
            elif gate_chunks:
                # per-query needed chunk count: enough chunks to cover the
                # min(nsample, total)-th hit — stragglers (total < nsample)
                # only need up to their LAST hit, everyone else up to the
                # chunk where the cumulative count reaches nsample; the
                # tile bound is the max.
                thr = jnp.minimum(total, float(nsample))  # (TM, 1)
                need = (jnp.sum((bnd < thr).astype(jnp.int32), axis=1) + halves) // halves
                bound = jnp.minimum(jnp.max(need), nch)

                for k in range(nsample):
                    acc_ref[k] = jnp.zeros((tm, acc_ref.shape[-1]), jnp.float32)

                def chunk_body(ch, carry):
                    rank = rank_ref[ch]
                    a_ch = A_ref[0, ch]  # (CHUNK, C1)
                    for k in range(1, nsample + 1):
                        sel = (rank == float(k)).astype(A_dtype)
                        acc_ref[k - 1] += jax.lax.dot_general(
                            sel, a_ch, dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    return carry

                jax.lax.fori_loop(0, bound, chunk_body, 0)
                vals = [acc_ref[k] for k in range(nsample)]
            else:
                # static unroll, register accumulation — no scratch RMW
                # traffic; this is the fastest form when tile bounds pin at
                # nch anyway (paper radii: 30-58% straggler queries)
                vals = []
                for k in range(1, nsample + 1):
                    acc = None
                    for ch in range(nch):
                        sel = (rank_ref[ch] == float(k)).astype(A_dtype)
                        d = jax.lax.dot_general(
                            sel, A_ref[0, ch], dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        acc = d if acc is None else acc + d
                    vals.append(acc)

            best = None
            first = None
            for k in range(1, nsample + 1):
                val = vals[k - 1]
                # first-hit fill on the narrow (TM, C1) tile so padded slots
                # duplicate slot 1 (never changing the max), exactly like the
                # unfused grouped tensor
                if first is None:
                    first = val
                else:
                    val = jnp.where(total >= float(k), val, first)
                h = jnp.maximum((val - Bq) * a0 + b0, 0.0)
                hw = jnp.dot(h.astype(W1.dtype), W1, preferred_element_type=jnp.float32)
                o = jnp.maximum(hw * a1 + b1, 0.0)  # (TM, C2)
                best = o if best is None else jnp.maximum(best, o)
            out_refs[s][0] = best.astype(out_refs[s].dtype)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6, 7, 8))
def ball_query_group_mlp_pallas(
    scales: tuple[tuple[float, int], ...],
    xyz: jax.Array,
    new_xyz: jax.Array,
    scale_params: tuple,
    interpret: bool = False,
    query_tile: int | None = None,
    gate_chunks: bool = False,
    subtile: int = 0,
    debug_bounds: tuple[int, int] | None = None,
) -> tuple[jax.Array, ...]:
    """Inference-only fully fused SA stage (all scales in one kernel).

    ``scale_params[s]``: (A (B,N,C1), Bq (B,M,C1), a0 (C1,), b0 (C1,),
    W1 (C1,C2), a1 (C2,), b1 (C2,)) — the delayed-aggregation layer-1 plane,
    the query subtraction term, and the eval-mode BN affines folded around
    the second conv. Returns one (B, M, C2_s) max-pooled output per scale.
    """
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    Np = _round_up(N, _CHUNK)  # chunked MXU prefix wants whole chunks
    # Tile-size trade-off: large query tiles reuse the streamed A operand
    # across more MXU rows (-10% at 512 vs 128), while the chunk gate is
    # bounded by the TILE's worst query — smaller sorted tiles quarantine
    # straggler queries. Measured on-chip at bench shapes (640x512x8000):
    # 512 -> 263 ms, 256 sorted -> 282, 128 sorted -> 286: FPS centroids put
    # 30-58% of queries below nsample hits (hits spread across scan order),
    # so sorted tiles still bound at nch and the A-reuse loss wins. The gate
    # pays off in dense regimes (r=.9: 71 ms vs r=.1: 119 ms, same shapes).
    tm = query_tile or min(512, _round_up(M, 128))
    Mp = _round_up(M, tm)
    G = Mp // tm
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)

    # Query ordering (a pure permutation, inverted on the outputs — results
    # are bit-identical to the unsorted kernel since selection is exact):
    #
    # * subtile mode: exact composite key from the bounds pre-pass — dense
    #   queries (total >= ns) ascending by chunks-needed, stragglers after
    #   them ascending by hit count; the costliest scale (largest ns) keys
    #   first. Each 32-row sub-tile then gates on near-homogeneous bounds.
    #   (A strided-subsample density ESTIMATE measured 75-85% of ungated
    #   work vs 36-55% with exact keys — one misplaced straggler per tile
    #   pins both gates, so the pre-pass pays for itself.)
    # * gate_chunks (legacy whole-tile gate): subsample density estimate.
    if subtile and Np // _CHUNK <= 1:
        subtile = 0  # single-chunk supports have nothing to gate
    sort = (gate_chunks and G > 1) or subtile
    if subtile:
        order = jnp.argsort(_subtile_order_key(scales, xyz, new_xyz, interpret), axis=1)
    elif sort:
        stride = max(1, N // _CHUNK)
        sub = xyz[:, ::stride][:, :_CHUNK]
        d2s = jnp.sum((new_xyz[:, :, None, :] - sub[:, None, :, :]) ** 2, axis=-1)
        rmin2 = min(r for r, _ in scales) ** 2
        hits = jnp.sum(d2s < rmin2, axis=-1)  # (B, M)
        order = jnp.argsort(-hits, axis=1)
    if sort:
        inv_order = jnp.argsort(order, axis=1)
        new_xyz = jnp.take_along_axis(new_xyz, order[..., None], axis=1)
        scale_params = tuple(
            (A, jnp.take_along_axis(Bq, order[..., None], axis=1), a0, b0, W1, a1, b1)
            for A, Bq, a0, b0, W1, a1, b1 in scale_params
        )

    # poison coords on padded support lanes: their d2 is astronomically
    # large, so the kernel needs no lane-index masking at all. Chunk-major
    # layout: lane slices at offsets cannot broadcast in Mosaic, so each
    # 512-lane chunk lives at lane offset 0 of its own sublane row.
    nch = Np // _CHUNK
    sup = [
        jnp.pad(xyz[..., i], ((0, 0), (0, Np - N)), constant_values=1e12).reshape(B, nch, 1, _CHUNK)
        for i in range(3)
    ]
    qry = [jnp.pad(new_xyz[..., i], ((0, 0), (0, Mp - M))).reshape(B * G, 1, tm) for i in range(3)]

    A_in, bq_in, a0_in, b0_in, w1_in, a1_in, b1_in = [], [], [], [], [], [], []
    for A, Bq, a0, b0, W1, a1, b1 in scale_params:
        # chunk-major layout (free reshape) so the kernel's gated dynamic
        # chunk loop indexes a leading (non-lane) dimension. Callers may
        # hand A already row-padded to Np (SetAbstractionMSG computes it on
        # zero-padded inputs) — padding HERE forces XLA to materialize a
        # copy + pad temp of the multi-GB plane (measured 3x4.5G HLO temps
        # at S=64, the HBM OOM of 2026-08-18); pad rows are never selected
        # (poison support coords), so any zero rows are equivalent.
        assert A.shape[1] in (N, Np), (A.shape, N, Np)
        A_in.append(jnp.pad(A, ((0, 0), (0, Np - A.shape[1]), (0, 0))).reshape(B, nch, _CHUNK, -1))
        bq_in.append(
            jnp.pad(Bq.astype(jnp.float32), ((0, 0), (0, Mp - M), (0, 0))).reshape(B * G, tm, -1)
        )
        a0_in.append(a0.reshape(1, 1, -1).astype(jnp.float32))
        b0_in.append(b0.reshape(1, 1, -1).astype(jnp.float32))
        w1_in.append(W1[None])
        a1_in.append(a1.reshape(1, 1, -1).astype(jnp.float32))
        b1_in.append(b1.reshape(1, 1, -1).astype(jnp.float32))

    grid = (B, G)
    qspec = pl.BlockSpec((1, 1, tm), lambda b, m: (b * G + m, 0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, nch, 1, _CHUNK), lambda b, m: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    A_specs = [
        pl.BlockSpec((1, nch, _CHUNK, A.shape[-1]), lambda b, m: (b, 0, 0, 0), memory_space=pltpu.VMEM)
        for A in A_in
    ]
    bq_specs = [
        pl.BlockSpec((1, tm, q.shape[-1]), lambda b, m: (b * G + m, 0, 0), memory_space=pltpu.VMEM)
        for q in bq_in
    ]
    vec_spec = lambda v: pl.BlockSpec(v.shape, lambda b, m: (0, 0, 0), memory_space=pltpu.VMEM)
    out_specs = tuple(
        pl.BlockSpec((1, tm, w.shape[-1]), lambda b, m: (b * G + m, 0, 0), memory_space=pltpu.VMEM)
        for w in w1_in
    )
    out_shapes = tuple(
        jax.ShapeDtypeStruct((B * G, tm, w.shape[-1]), A.dtype) for w, (A, *_r) in zip(w1_in, scale_params)
    )

    outs = pl.pallas_call(
        _make_group_mlp_kernel(scales, N, tm, gate_chunks, subtile, debug_bounds),
        grid=grid,
        in_specs=[qspec, qspec, qspec, sspec, sspec, sspec,
                  *A_specs, *bq_specs,
                  *[vec_spec(v) for v in a0_in], *[vec_spec(v) for v in b0_in],
                  *[vec_spec(v) for v in w1_in],
                  *[vec_spec(v) for v in a1_in], *[vec_spec(v) for v in b1_in]],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((nch, tm, _CHUNK), jnp.float32),
            pltpu.VMEM((nch, tm, _CHUNK), jnp.float32),
            *[pltpu.VMEM((ns, tm, A.shape[-1]), jnp.float32) for (_r, ns), A in zip(scales, A_in)],
        ],
        # 106MB (v5e has 128): f32 feature planes (paper-weight parity runs,
        # the driver's entry() compile check) demand 101.3M where the bf16
        # production path fits in 100M
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=106 * 1024 * 1024),
        interpret=interpret,
    )(*qry, *sup, *A_in, *bq_in, *a0_in, *b0_in, *w1_in, *a1_in, *b1_in)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    outs = tuple(o.reshape(B, Mp, -1)[:, :M] for o in outs)
    if sort:
        outs = tuple(jnp.take_along_axis(o, inv_order[..., None], axis=1) for o in outs)
    return outs


# ---------------------------------------------------------------------------
# gated grouping (train path): grouped tensors out, two-gate + bounds inputs
# ---------------------------------------------------------------------------


def _make_group_kernel_gated(scales, tm: int, subtile: int, nch: int, pack_slots: bool = False,
                             from_raw: bool = False):
    """Grouped-feature kernel with the v4 gating machinery: emits the full
    (tm, ns, C) grouped tensors (train path needs them for exact batch-stat
    BN), but distances/prefixes/selections only run on the chunks the exact
    input bounds require. Queries arrive SORTED (caller's composite key) —
    order only affects tile homogeneity, never values.

    pack_slots: emit slot PAIRS lane-packed — (ns/2, tm, 2C) — so the
    downstream BN/MLP chain rides full 128-lane HBM tiles when C=64 (half
    of every bf16 tile is lane padding otherwise; the XLA repack that
    `packed_chain` pays for is free here because the kernel writes the
    packed layout directly). Values are identical — slot s lives in lane
    half s%2 of pair s//2.

    from_raw: the per-scale A operand is the LAYER-1 WEIGHT (C0, C1) and one
    shared channel-major raw [xyz|feat] plane (1, C0, nch, CHUNK) rides in
    after the bounds; each program materializes its A planes in VMEM (same
    bf16-in/f32-acc arithmetic as the XLA dense), so the multi-GB HBM A
    planes never exist on the TRAIN path either (the eval analogue is
    `_make_group_mlp_kernel_v4`'s from_raw)."""
    S = len(scales)
    PC = _CHUNK // 2
    halves = _CHUNK // PC

    def kernel(qx_ref, qy_ref, qz_ref, x_ref, y_ref, z_ref, *rest):
        A_refs = rest[0:S]  # from_raw: per-scale W0 (1, C0, C1)
        bounds_refs = rest[S : 2 * S]
        nin = 2 * S + (1 if from_raw else 0)
        raw_ref = rest[2 * S] if from_raw else None  # (1, C0, nch, CHUNK)
        out_refs = rest[nin : nin + S]  # per scale (1, ns[/2], tm, C[*2]) slot-major
        rank_ref = rest[nin + S]  # (nch, subtile, CHUNK) f32 scratch
        a_scr_refs = rest[nin + S + 1 :] if from_raw else ()  # (nch, CHUNK, C1)

        tri = _tri_inclusive(jnp.bfloat16, PC)
        qx = qx_ref[0].reshape(tm, 1)
        qy = qy_ref[0].reshape(tm, 1)
        qz = qz_ref[0].reshape(tm, 1)

        def chunk_ranks(ch, rs, carry, r2):
            dx = qx[rs] - x_ref[0, ch]
            dy = qy[rs] - y_ref[0, ch]
            dz = qz[rs] - z_ref[0, ch]
            d2 = dx * dx + dy * dy + dz * dz
            parts = []
            off = carry
            for hf in range(halves):
                mh = d2[:, hf * PC : (hf + 1) * PC] < r2
                loc = jax.lax.dot_general(
                    mh.astype(tri.dtype), tri, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                parts.append(jnp.where(mh, loc + off, 0.0))
                off = off + loc[:, PC - 1 : PC]
            return jnp.concatenate(parts, axis=1), off

        for s, (radius, nsample) in enumerate(scales):
            out_ref = out_refs[s]  # (1, ns, tm, C) — slot-major: a (32, C)
            # store per (slot, subtile) is a contiguous-sublane write; the
            # query-major layout needs an unsupported strided shape cast.
            # pack_slots: (1, ns/2, tm, 2C) — slot pairs concatenated into
            # lanes in-register (offset-0 values only), one aligned store
            A_dtype = A_refs[s].dtype
            if from_raw:
                # materialize this scale's A plane in VMEM from the shared
                # channel-major raw plane (contraction over the C0 sublane
                # dim — the proven v4-eval from_raw pattern)
                W0 = A_refs[s][0]
                C = W0.shape[-1]
                for cp in range(nch):
                    a_scr_refs[s][cp] = jax.lax.dot_general(
                        raw_ref[0, :, cp], W0,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(A_dtype)
                A_get = lambda ch, s=s: a_scr_refs[s][ch]
            else:
                C = A_refs[s].shape[-1]
                A_get = lambda ch, A_ref=A_refs[s]: A_ref[0, ch]
            r2s = radius * radius
            bounds = bounds_refs[s][0]  # (tm, 2) [need, thr]
            nslots = nsample // 2 if pack_slots else nsample

            def sel_dot(rank, kf, a_ch):
                sel = (rank == kf).astype(A_dtype)
                return jax.lax.dot_general(
                    sel, a_ch, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            for r0 in range(0, tm, subtile):
                rs = slice(r0, r0 + subtile)
                needv = bounds[rs, 0:1]
                thrv = bounds[rs, 1:2]
                h = jnp.minimum(jnp.max(needv), float(nch)).astype(jnp.int32)
                cap = jnp.maximum(jnp.max(thrv), 1.0).astype(jnp.int32)
                use_chunk = h * nsample <= cap * nch

                for k in range(nslots):
                    out_ref[0, k, rs] = jnp.zeros(
                        (subtile, out_ref.shape[-1]), out_ref.dtype
                    )

                @pl.when(use_chunk)
                def _chunk(rs=rs, h=h, A_get=A_get, out_ref=out_ref, r2s=r2s):
                    def body(ch, carry):
                        rank, carry = chunk_ranks(ch, rs, carry, r2s)
                        a_ch = A_get(ch)
                        if pack_slots:
                            for j in range(nsample // 2):
                                d = jnp.concatenate(
                                    [sel_dot(rank, float(2 * j + 1), a_ch),
                                     sel_dot(rank, float(2 * j + 2), a_ch)],
                                    axis=1,
                                )
                                out_ref[0, j, rs] += d.astype(out_ref.dtype)
                        else:
                            for k in range(1, nsample + 1):
                                out_ref[0, k - 1, rs] += sel_dot(
                                    rank, float(k), a_ch
                                ).astype(out_ref.dtype)
                        return carry

                    jax.lax.fori_loop(0, h, body, jnp.zeros((subtile, 1), jnp.float32))

                @pl.when(jnp.logical_not(use_chunk))
                def _slot(rs=rs, cap=cap, A_get=A_get, out_ref=out_ref, r2s=r2s):
                    # straggler tiles: all nch chunks, cap slots; rank planes
                    # built once per subtile with a static chunk loop
                    carry = jnp.zeros((subtile, 1), jnp.float32)
                    for ch in range(nch):
                        rank_ref[ch], carry = chunk_ranks(ch, rs, carry, r2s)

                    if pack_slots:
                        # pair iterations: both slots of a pair per step (an
                        # odd cap computes one dead slot — its sel has no
                        # hits, and the fill epilogue rewrites it anyway)
                        def slot_body(i, c):
                            kf0 = (2 * i + 1).astype(jnp.float32)
                            kf1 = (2 * i + 2).astype(jnp.float32)
                            acc0 = acc1 = None
                            for ch in range(nch):
                                d0 = sel_dot(rank_ref[ch], kf0, A_get(ch))
                                d1 = sel_dot(rank_ref[ch], kf1, A_get(ch))
                                acc0 = d0 if acc0 is None else acc0 + d0
                                acc1 = d1 if acc1 is None else acc1 + d1
                            out_ref[0, i, rs] = jnp.concatenate(
                                [acc0, acc1], axis=1
                            ).astype(out_ref.dtype)
                            return c

                        jax.lax.fori_loop(0, (cap + 1) // 2, slot_body, 0)
                    else:
                        def slot_body(i, c):
                            kf = (i + 1).astype(jnp.float32)
                            acc = None
                            for ch in range(nch):
                                d = sel_dot(rank_ref[ch], kf, A_get(ch))
                                acc = d if acc is None else acc + d
                            out_ref[0, i, rs] = acc.astype(out_ref.dtype)
                            return c

                        jax.lax.fori_loop(0, cap, slot_body, 0)

                # first-hit fill: slots past thr duplicate slot 1 (exactly
                # the reference padding the train consumers rely on)
                if pack_slots:
                    # full-width masked blend: a (subtile, 1) mask cannot
                    # broadcast against a lane-offset slice, so the mask is
                    # assembled at full 2C width from offset-0 halves
                    p0 = out_ref[0, 0, rs]
                    first = p0[:, :C]
                    first2 = jnp.concatenate([first, first], axis=1)
                    ones = jnp.ones((subtile, C), jnp.float32)
                    for j in range(nsample // 2):
                        m0 = ones * (thrv >= float(2 * j + 1)).astype(jnp.float32)
                        m1 = ones * (thrv >= float(2 * j + 2)).astype(jnp.float32)
                        mask = jnp.concatenate([m0, m1], axis=1)
                        cur = p0 if j == 0 else out_ref[0, j, rs]
                        out_ref[0, j, rs] = jnp.where(
                            mask > 0.0, cur, first2.astype(cur.dtype)
                        )
                else:
                    first = out_ref[0, 0, rs]
                    for k in range(2, nsample + 1):
                        cur = out_ref[0, k - 1, rs]
                        out_ref[0, k - 1, rs] = jnp.where(thrv >= float(k), cur, first.astype(cur.dtype))

    return kernel


def _make_group_bwd_kernel_gated(scales, tm: int, subtile: int, nch: int,
                                 from_raw: bool = False):
    """Backward of the gated grouping kernel: dA[s] += sel^T @ g with the
    same two-gate chunk scanning (sel is zero outside each query's bound by
    construction, so skipping those chunks is exact). First-hit-fill grad
    routing (invalid slots' grads to slot 1) matches the ungated bwd.

    from_raw: dA accumulates in VMEM scratch instead of an HBM output, and
    each batch row's last grid step folds it straight into the tiny
    per-scale dW0 = sum_ch raw_ch @ dA_ch output ((C0, C1), one revisited
    block shared by every program) — the multi-GB f32 dA planes never exist
    in HBM and XLA's downstream input^T @ dA matmul disappears. Exact up to
    f32 reassociation (per-chunk partial sums instead of one flat
    contraction)."""
    S = len(scales)
    PC = _CHUNK // 2
    halves = _CHUNK // PC

    def kernel(qx_ref, qy_ref, qz_ref, x_ref, y_ref, z_ref, *rest):
        g_refs = rest[0:S]
        bounds_refs = rest[S : 2 * S]
        nin = 2 * S + (1 if from_raw else 0)
        raw_ref = rest[2 * S] if from_raw else None  # (1, C0, nch, CHUNK)
        out_refs = rest[nin : nin + S]  # dA (1, nch, CHUNK, C) | dW0 (1, C0, C1)
        rank_ref = rest[nin + S]
        dA_scr_refs = rest[nin + S + 1 :] if from_raw else ()  # (nch, CHUNK, C) f32

        tri = _tri_inclusive(jnp.bfloat16, PC)
        qx = qx_ref[0].reshape(tm, 1)
        qy = qy_ref[0].reshape(tm, 1)
        qz = qz_ref[0].reshape(tm, 1)

        if from_raw:
            @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
            def _():
                for r in out_refs:
                    r[0] = jnp.zeros_like(r[0])

            @pl.when(pl.program_id(1) == 0)
            def _():
                for scr in dA_scr_refs:
                    for ch in range(nch):
                        scr[ch] = jnp.zeros(scr.shape[1:], scr.dtype)

            def dA_add(s, ch, v):
                dA_scr_refs[s][ch] += v
        else:
            @pl.when(pl.program_id(1) == 0)
            def _():
                for r in out_refs:
                    r[0] = jnp.zeros_like(r[0])

            def dA_add(s, ch, v):
                out_refs[s][0, ch] += v

        def chunk_ranks(ch, rs, carry, r2):
            dx = qx[rs] - x_ref[0, ch]
            dy = qy[rs] - y_ref[0, ch]
            dz = qz[rs] - z_ref[0, ch]
            d2 = dx * dx + dy * dy + dz * dz
            parts = []
            off = carry
            for hf in range(halves):
                mh = d2[:, hf * PC : (hf + 1) * PC] < r2
                loc = jax.lax.dot_general(
                    mh.astype(tri.dtype), tri, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                parts.append(jnp.where(mh, loc + off, 0.0))
                off = off + loc[:, PC - 1 : PC]
            return jnp.concatenate(parts, axis=1), off

        for s, (radius, nsample) in enumerate(scales):
            g_ref = g_refs[s]  # (1, ns, tm, C) slot-major
            r2s = radius * radius
            bounds = bounds_refs[s][0]

            for r0 in range(0, tm, subtile):
                rs = slice(r0, r0 + subtile)
                needv = bounds[rs, 0:1]
                thrv = bounds[rs, 1:2]
                h = jnp.minimum(jnp.max(needv), float(nch)).astype(jnp.int32)
                cap = jnp.maximum(jnp.max(thrv), 1.0).astype(jnp.int32)
                use_chunk = h * nsample <= cap * nch

                # effective grads: slots past thr route to slot 1 (per-slot
                # (subtile, 1) masks — rank-2 ops only; Mosaic can't lower
                # rank-3 reductions)
                graw = [g_ref[0, k, rs].astype(jnp.float32) for k in range(nsample)]
                inv = [(thrv < float(k)).astype(jnp.float32) for k in range(1, nsample + 1)]
                g_first = graw[0] * (1.0 - inv[0])
                for k in range(nsample):
                    g_first = g_first + graw[k] * inv[k]
                gks = [g_first] + [graw[k - 1] * (1.0 - inv[k - 1]) for k in range(2, nsample + 1)]

                @pl.when(use_chunk)
                def _chunk(rs=rs, h=h, gks=gks, s=s, r2s=r2s):
                    def body(ch, carry):
                        rank, carry = chunk_ranks(ch, rs, carry, r2s)
                        acc = None
                        for k in range(1, nsample + 1):
                            sel = (rank == float(k)).astype(jnp.float32)
                            d = jax.lax.dot_general(
                                sel, gks[k - 1], dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )  # (CHUNK, C)
                            acc = d if acc is None else acc + d
                        dA_add(s, ch, acc)
                        return carry

                    jax.lax.fori_loop(0, h, body, jnp.zeros((subtile, 1), jnp.float32))

                @pl.when(jnp.logical_not(use_chunk))
                def _slot(rs=rs, cap=cap, gks=gks, s=s, r2s=r2s):
                    carry = jnp.zeros((subtile, 1), jnp.float32)
                    for ch in range(nch):
                        rank_ref[ch], carry = chunk_ranks(ch, rs, carry, r2s)

                    def slot_body(i, c):
                        # gks indexed dynamically: scalar-masked sum over the
                        # ns static slots (rank-3 one-hot reductions don't
                        # lower in Mosaic)
                        kf = (i + 1).astype(jnp.float32)
                        gk = gks[0] * (i == 0).astype(jnp.float32)
                        for k in range(1, nsample):
                            gk = gk + gks[k] * (i == k).astype(jnp.float32)
                        for ch in range(nch):
                            sel = (rank_ref[ch] == kf).astype(jnp.float32)
                            dA_add(s, ch, jax.lax.dot_general(
                                sel, gk, dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            ))
                        return c

                    jax.lax.fori_loop(0, cap, slot_body, 0)

        if from_raw:
            # fold this batch row's accumulated dA into dW0 on its LAST grid
            # step (grid iterates m innermost; the shared dW0 block then
            # accumulates across rows — TPU grid steps are sequential)
            @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
            def _flush():
                for s in range(S):
                    acc = None
                    for ch in range(nch):
                        d = jax.lax.dot_general(
                            raw_ref[0, :, ch].astype(jnp.float32), dA_scr_refs[s][ch],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # (C0, C1)
                        acc = d if acc is None else acc + d
                    out_refs[s][0] += acc

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 5, 6))
def ball_query_group_pallas_gated(
    scales: tuple[tuple[float, int], ...],
    xyz: jax.Array,
    new_xyz: jax.Array,
    feats: tuple[jax.Array, ...],
    bounds: tuple[tuple[jax.Array, jax.Array], ...],
    interpret: bool = False,
    pack_slots: bool = False,
) -> tuple[jax.Array, ...]:
    """Two-gate grouped ball query with exact bounds as inputs (train path).

    Same selection semantics as :func:`ball_query_group_pallas` (reference
    first-hit padding, grads to ``feats``), but every per-chunk cost is
    gated by the FPS-fused bounds, and the grouped tensors are emitted
    SLOT-MAJOR — (B, ns, M, C) — both ways: that is the layout the kernel
    can store contiguously, and keeping it end-to-end avoids materializing
    a second multi-GB copy per scale. Callers should pass new_xyz SORTED by
    the composite key (and un-permute downstream) — the values are
    order-independent, the speed is not.

    pack_slots: emit (B, ns/2, M, 2C) — slot s in lane half s%2 of pair
    s//2 — so a C=64 bf16 chain rides full 128-lane HBM tiles downstream
    (ns must be even, C < 128). The backward accepts cotangents in the
    packed layout (one XLA lane-slice unpack feeds the unchanged bwd
    kernel). Values identical to the unpacked layout."""
    return _bqgg_forward(scales, xyz, new_xyz, feats, bounds, interpret, pack_slots)


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def _bqgg_forward(scales, xyz, new_xyz, feats, bounds, interpret, pack_slots=False):
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    Np = _round_up(N, _CHUNK)
    nch = Np // _CHUNK
    tm = min(512, _round_up(M, 128))
    Mp = _round_up(M, tm)
    G = Mp // tm
    subtile = 32
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)

    sup = [
        jnp.pad(xyz[..., i], ((0, 0), (0, Np - N)), constant_values=1e12).reshape(B, nch, 1, _CHUNK)
        for i in range(3)
    ]
    qry = [jnp.pad(new_xyz[..., i], ((0, 0), (0, Mp - M))).reshape(B * G, 1, tm) for i in range(3)]
    fpad = [jnp.pad(f, ((0, 0), (0, Np - N), (0, 0))).reshape(B, nch, _CHUNK, -1) for f in feats]
    bnds = [
        jnp.pad(jnp.stack([need, thr], axis=-1), ((0, 0), (0, Mp - M), (0, 0))).reshape(B * G, tm, 2)
        for need, thr in bounds
    ]

    grid = (B, G)
    qspec = pl.BlockSpec((1, 1, tm), lambda b, m: (b * G + m, 0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, nch, 1, _CHUNK), lambda b, m: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    fspecs = [
        pl.BlockSpec((1, nch, _CHUNK, f.shape[-1]), lambda b, m: (b, 0, 0, 0), memory_space=pltpu.VMEM)
        for f in fpad
    ]
    bspec = pl.BlockSpec((1, tm, 2), lambda b, m: (b * G + m, 0, 0), memory_space=pltpu.VMEM)
    if pack_slots:
        assert all(ns % 2 == 0 and f.shape[-1] < 128 for (_, ns), f in zip(scales, feats)), (
            "pack_slots needs even nsample and C < 128")
    # outputs STAY slot-major (B, ns, Mp, C): each grid step writes its
    # (1, ns, tm, C) block into the Mp slice directly — transposing to
    # query-major would materialize a second multi-GB copy of tensors that
    # already dominate train-step HBM (observed OOM at S=8 bench shapes).
    # pack_slots: (B, ns/2, Mp, 2C) — full-lane tiles for the C=64 chain
    sdim = lambda ns: ns // 2 if pack_slots else ns
    cdim = lambda f: f.shape[-1] * 2 if pack_slots else f.shape[-1]
    out_specs = tuple(
        pl.BlockSpec((1, sdim(ns), tm, cdim(f)), lambda b, m: (b, 0, m, 0), memory_space=pltpu.VMEM)
        for (_, ns), f in zip(scales, feats)
    )
    out_shapes = tuple(
        jax.ShapeDtypeStruct((B, sdim(ns), Mp, cdim(f)), f.dtype) for (_, ns), f in zip(scales, feats)
    )

    outs = pl.pallas_call(
        _make_group_kernel_gated(scales, tm, subtile, nch, pack_slots),
        grid=grid,
        in_specs=[qspec, qspec, qspec, sspec, sspec, sspec, *fspecs, *[bspec] * len(scales)],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((nch, subtile, _CHUNK), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*qry, *sup, *fpad, *bnds)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    return tuple(o[:, :, :M] for o in outs)


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def _bqgg_backward_impl(scales, xyz, new_xyz, gs, bounds, interpret, feat_shapes_dtypes):
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    Np = _round_up(N, _CHUNK)
    nch = Np // _CHUNK
    tm = min(512, _round_up(M, 128))
    Mp = _round_up(M, tm)
    G = Mp // tm
    # coarser gate than the fwd's 32: the bwd dots contract over the subtile
    # axis (sel^T @ g), so subtile IS the MXU K dim — 32 leaves the MXU at
    # quarter rate and measured SLOWER than ungated despite ~40% of the slot
    # work; 128 trades a looser gate for full-K dots
    subtile = min(128, tm)
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    sup = [
        jnp.pad(xyz[..., i], ((0, 0), (0, Np - N)), constant_values=1e12).reshape(B, nch, 1, _CHUNK)
        for i in range(3)
    ]
    qry = [jnp.pad(new_xyz[..., i], ((0, 0), (0, Mp - M))).reshape(B * G, 1, tm) for i in range(3)]
    # cotangents arrive slot-major (B, ns, M, C), matching the fwd output
    gpad = [jnp.pad(g, ((0, 0), (0, 0), (0, Mp - M), (0, 0))) for g in gs]
    bnds = [
        jnp.pad(jnp.stack([need, thr], axis=-1), ((0, 0), (0, Mp - M), (0, 0))).reshape(B * G, tm, 2)
        for need, thr in bounds
    ]

    grid = (B, G)
    qspec = pl.BlockSpec((1, 1, tm), lambda b, m: (b * G + m, 0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, nch, 1, _CHUNK), lambda b, m: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    gspecs = [
        pl.BlockSpec((1, g.shape[1], tm, g.shape[3]), lambda b, m: (b, 0, m, 0), memory_space=pltpu.VMEM)
        for g in gpad
    ]
    bspec = pl.BlockSpec((1, tm, 2), lambda b, m: (b * G + m, 0, 0), memory_space=pltpu.VMEM)
    out_specs = tuple(
        pl.BlockSpec((1, nch, _CHUNK, c), lambda b, m: (b, 0, 0, 0), memory_space=pltpu.VMEM)
        for (_n, c), _dt in feat_shapes_dtypes
    )
    out_shapes = tuple(
        jax.ShapeDtypeStruct((B, nch, _CHUNK, c), jnp.float32) for (_n, c), _dt in feat_shapes_dtypes
    )
    outs = pl.pallas_call(
        _make_group_bwd_kernel_gated(scales, tm, subtile, nch),
        grid=grid,
        in_specs=[qspec, qspec, qspec, sspec, sspec, sspec, *gspecs, *[bspec] * len(scales)],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((nch, subtile, _CHUNK), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*qry, *sup, *gpad, *bnds)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    return tuple(
        o.reshape(B, Np, -1)[:, :N, :].astype(jnp.dtype(dt))
        for o, ((_n, _c), dt) in zip(outs, feat_shapes_dtypes)
    )


def _bqgg_fwd(scales, xyz, new_xyz, feats, bounds, interpret, pack_slots=False):
    out = _bqgg_forward(scales, xyz, new_xyz, feats, bounds, interpret, pack_slots)
    return out, (xyz, new_xyz, bounds)


def _bqgg_bwd(scales, interpret, pack_slots, res, gs):
    xyz, new_xyz, bounds = res
    if pack_slots:
        # cotangents arrive (B, ns/2, M, 2C): unpack the lane pairs back to
        # (B, ns, M, C) for the (unchanged) bwd kernel. One lane-slice copy
        # per plane — cheap next to the selection matmuls it feeds.
        gs = tuple(
            jnp.stack([g[..., : g.shape[-1] // 2], g[..., g.shape[-1] // 2 :]], axis=2)
            .reshape(g.shape[0], g.shape[1] * 2, g.shape[2], g.shape[-1] // 2)
            for g in gs
        )
    feat_shapes_dtypes = tuple(((xyz.shape[1], g.shape[-1]), jnp.dtype(g.dtype).name) for g in gs)
    dA = _bqgg_backward_impl(scales, xyz, new_xyz, tuple(gs), bounds, interpret, feat_shapes_dtypes)
    zb = tuple((jnp.zeros_like(n), jnp.zeros_like(t)) for n, t in bounds)
    return jnp.zeros_like(xyz), jnp.zeros_like(new_xyz), dA, zb


ball_query_group_pallas_gated.defvjp(_bqgg_fwd, _bqgg_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 6, 7))
def ball_query_group_pallas_gated_raw(
    scales: tuple[tuple[float, int], ...],
    xyz: jax.Array,
    new_xyz: jax.Array,
    w0s: tuple[jax.Array, ...],
    raw: jax.Array,
    bounds: tuple[tuple[jax.Array, jax.Array], ...],
    interpret: bool = False,
    pack_slots: bool = False,
) -> tuple[jax.Array, ...]:
    """Raw-mode gated grouped ball query (train path).

    Same selection semantics and slot-major outputs as
    :func:`ball_query_group_pallas_gated`, but instead of per-scale HBM A
    planes it takes each scale's LAYER-1 WEIGHT ``w0s[s]`` (C0, C1) plus ONE
    shared CHANNEL-MAJOR ``raw`` (B, C0, N[p]) zero-padded [xyz|features]
    plane: the forward materializes A per chunk in VMEM (same bf16-in/
    f32-acc arithmetic as the XLA dense it replaces), and the backward
    accumulates dW0 = raw^T @ dA in-kernel — the multi-GB A (fwd) and f32 dA
    (bwd) planes never exist in HBM.

    COTANGENT CONTRACT: gradients flow to ``w0s`` exactly (up to f32
    reassociation); ``raw``/``xyz``/``new_xyz`` receive ZERO cotangents.
    That is exact for parameter training when the raw channels are MODEL
    INPUTS (SA1 — xyz already gets zeros in the non-raw VJP because
    selection is piecewise-constant in it). Callers whose features carry
    gradients (SA2+) must use the non-raw path; `SetAbstractionMSG` gates
    this via its `train_raw` field.
    """
    return _bqggr_forward(scales, xyz, new_xyz, w0s, raw, bounds, interpret, pack_slots)


@functools.partial(jax.jit, static_argnums=(0, 6, 7))
def _bqggr_forward(scales, xyz, new_xyz, w0s, raw, bounds, interpret, pack_slots=False):
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    Np = _round_up(N, _CHUNK)
    nch = Np // _CHUNK
    tm = min(512, _round_up(M, 128))
    Mp = _round_up(M, tm)
    G = Mp // tm
    subtile = 32
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)

    sup = [
        jnp.pad(xyz[..., i], ((0, 0), (0, Np - N)), constant_values=1e12).reshape(B, nch, 1, _CHUNK)
        for i in range(3)
    ]
    qry = [jnp.pad(new_xyz[..., i], ((0, 0), (0, Mp - M))).reshape(B * G, 1, tm) for i in range(3)]
    assert raw.shape[-1] in (N, Np), (raw.shape, N, Np)
    raw_p = jnp.pad(raw, ((0, 0), (0, 0), (0, Np - raw.shape[-1]))).reshape(B, raw.shape[1], nch, _CHUNK)
    w0_in = [w0[None] for w0 in w0s]  # (1, C0, C1)
    bnds = [
        jnp.pad(jnp.stack([need, thr], axis=-1), ((0, 0), (0, Mp - M), (0, 0))).reshape(B * G, tm, 2)
        for need, thr in bounds
    ]

    grid = (B, G)
    qspec = pl.BlockSpec((1, 1, tm), lambda b, m: (b * G + m, 0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, nch, 1, _CHUNK), lambda b, m: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    w0_specs = [
        pl.BlockSpec(w.shape, lambda b, m: (0, 0, 0), memory_space=pltpu.VMEM) for w in w0_in
    ]
    raw_spec = pl.BlockSpec((1, raw_p.shape[1], nch, _CHUNK), lambda b, m: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, tm, 2), lambda b, m: (b * G + m, 0, 0), memory_space=pltpu.VMEM)
    if pack_slots:
        assert all(ns % 2 == 0 and w.shape[-1] < 128 for (_, ns), w in zip(scales, w0s)), (
            "pack_slots needs even nsample and C < 128")
    sdim = lambda ns: ns // 2 if pack_slots else ns
    cdim = lambda w: w.shape[-1] * 2 if pack_slots else w.shape[-1]
    out_specs = tuple(
        pl.BlockSpec((1, sdim(ns), tm, cdim(w)), lambda b, m: (b, 0, m, 0), memory_space=pltpu.VMEM)
        for (_, ns), w in zip(scales, w0s)
    )
    out_shapes = tuple(
        jax.ShapeDtypeStruct((B, sdim(ns), Mp, cdim(w)), w.dtype) for (_, ns), w in zip(scales, w0s)
    )

    outs = pl.pallas_call(
        _make_group_kernel_gated(scales, tm, subtile, nch, pack_slots, from_raw=True),
        grid=grid,
        in_specs=[qspec, qspec, qspec, sspec, sspec, sspec, *w0_specs, *[bspec] * len(scales), raw_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((nch, subtile, _CHUNK), jnp.float32),
            *[pltpu.VMEM((nch, _CHUNK, w.shape[-1]), w.dtype) for w in w0s],
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*qry, *sup, *w0_in, *bnds, raw_p)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    return tuple(o[:, :, :M] for o in outs)


@functools.partial(jax.jit, static_argnums=(0, 6))
def _bqggr_backward_impl(scales, xyz, new_xyz, gs, raw, bounds, interpret):
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    Np = _round_up(N, _CHUNK)
    nch = Np // _CHUNK
    tm = min(512, _round_up(M, 128))
    Mp = _round_up(M, tm)
    G = Mp // tm
    # same fwd/bwd subtile asymmetry as the non-raw bwd (see
    # _bqgg_backward_impl): the bwd dots contract over the subtile axis
    subtile = min(128, tm)
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    sup = [
        jnp.pad(xyz[..., i], ((0, 0), (0, Np - N)), constant_values=1e12).reshape(B, nch, 1, _CHUNK)
        for i in range(3)
    ]
    qry = [jnp.pad(new_xyz[..., i], ((0, 0), (0, Mp - M))).reshape(B * G, 1, tm) for i in range(3)]
    gpad = [jnp.pad(g, ((0, 0), (0, 0), (0, Mp - M), (0, 0))) for g in gs]
    raw_p = jnp.pad(raw, ((0, 0), (0, 0), (0, Np - raw.shape[-1]))).reshape(B, raw.shape[1], nch, _CHUNK)
    bnds = [
        jnp.pad(jnp.stack([need, thr], axis=-1), ((0, 0), (0, Mp - M), (0, 0))).reshape(B * G, tm, 2)
        for need, thr in bounds
    ]

    grid = (B, G)
    qspec = pl.BlockSpec((1, 1, tm), lambda b, m: (b * G + m, 0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, nch, 1, _CHUNK), lambda b, m: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    gspecs = [
        pl.BlockSpec((1, g.shape[1], tm, g.shape[3]), lambda b, m: (b, 0, m, 0), memory_space=pltpu.VMEM)
        for g in gpad
    ]
    raw_spec = pl.BlockSpec((1, raw_p.shape[1], nch, _CHUNK), lambda b, m: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, tm, 2), lambda b, m: (b * G + m, 0, 0), memory_space=pltpu.VMEM)
    C0 = raw.shape[1]
    cs = [g.shape[-1] for g in gs]
    out_specs = tuple(
        pl.BlockSpec((1, C0, c), lambda b, m: (0, 0, 0), memory_space=pltpu.VMEM) for c in cs
    )
    out_shapes = tuple(jax.ShapeDtypeStruct((1, C0, c), jnp.float32) for c in cs)
    outs = pl.pallas_call(
        _make_group_bwd_kernel_gated(scales, tm, subtile, nch, from_raw=True),
        grid=grid,
        in_specs=[qspec, qspec, qspec, sspec, sspec, sspec, *gspecs, *[bspec] * len(scales), raw_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((nch, subtile, _CHUNK), jnp.float32),
            *[pltpu.VMEM((nch, _CHUNK, c), jnp.float32) for c in cs],
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*qry, *sup, *gpad, *bnds, raw_p)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    return tuple(o[0] for o in outs)


def _bqggr_fwd(scales, xyz, new_xyz, w0s, raw, bounds, interpret, pack_slots=False):
    out = _bqggr_forward(scales, xyz, new_xyz, w0s, raw, bounds, interpret, pack_slots)
    # () dtype tokens so the bwd can cast dW0 to the primal w0 dtypes
    return out, (xyz, new_xyz, raw, bounds, tuple(jnp.zeros((), w.dtype) for w in w0s))


def _bqggr_bwd(scales, interpret, pack_slots, res, gs):
    xyz, new_xyz, raw, bounds, w0_tokens = res
    if pack_slots:
        gs = tuple(
            jnp.stack([g[..., : g.shape[-1] // 2], g[..., g.shape[-1] // 2 :]], axis=2)
            .reshape(g.shape[0], g.shape[1] * 2, g.shape[2], g.shape[-1] // 2)
            for g in gs
        )
    dW0 = _bqggr_backward_impl(scales, xyz, new_xyz, tuple(gs), raw, bounds, interpret)
    dW0 = tuple(d.astype(t.dtype) for d, t in zip(dW0, w0_tokens))
    zb = tuple((jnp.zeros_like(n), jnp.zeros_like(t)) for n, t in bounds)
    # zero cotangents for xyz/new_xyz (selection is piecewise-constant in
    # them, matching the non-raw VJP) and for raw (inputs-only contract —
    # see the primal docstring)
    return jnp.zeros_like(xyz), jnp.zeros_like(new_xyz), dW0, jnp.zeros_like(raw), zb


ball_query_group_pallas_gated_raw.defvjp(_bqggr_fwd, _bqggr_bwd)


@functools.partial(jax.jit, static_argnums=(0, 5, 6, 7, 8))
def ball_query_group_mlp_pallas_v4(
    scales: tuple[tuple[float, int], ...],
    xyz: jax.Array,
    new_xyz: jax.Array,
    scale_params: tuple,
    bounds: tuple[tuple[jax.Array, jax.Array], ...],
    interpret: bool = False,
    query_tile: int | None = None,
    subtile: int = 32,
    pair_chunks: bool = True,
    raw: jax.Array | None = None,
) -> tuple[jax.Array, ...]:
    """Fully fused inference SA stage, v4: gate bounds as inputs.

    ``bounds[s]``: (need (B, M), thr (B, M)) from `_counts_to_bounds` over
    the FPS kernel's fused per-chunk hit counts — exact (identical f32
    arithmetic), so no pre-pass kernel and no in-kernel full-width prefix.
    Results are bit-identical to the static kernel. Other arguments as in
    :func:`ball_query_group_mlp_pallas`.

    ``raw``: (B, C0, N[p]) CHANNEL-MAJOR zero-padded [xyz|features] plane
    shared by all scales (channel-minor would pad C0 to 128 lanes in HBM —
    see the layout comment at the assert below). When given,
    ``scale_params[s][0]`` is the scale's LAYER-1
    WEIGHT (C0, C1) instead of its A plane: each program computes its A in
    VMEM (same bf16-input/f32-accumulate arithmetic as the XLA dense), so
    the multi-GB HBM A planes never exist — per bench batch ~10 GB of HBM
    traffic traded for ~38 GFLOP of in-kernel recompute.
    """
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    Np = _round_up(N, _CHUNK)
    nch = Np // _CHUNK
    tm = query_tile or min(512, _round_up(M, 128))
    Mp = _round_up(M, tm)
    G = Mp // tm
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    if pair_chunks and nch % 2:
        pair_chunks = False
    step = 2 if pair_chunks else 1

    order = bounds_order_key_argsort(scales, bounds)
    inv_order = jnp.argsort(order, axis=1)
    new_xyz = jnp.take_along_axis(new_xyz, order[..., None], axis=1)
    scale_params = tuple(
        (A, jnp.take_along_axis(Bq, order[..., None], axis=1), a0, b0, W1, a1, b1)
        for A, Bq, a0, b0, W1, a1, b1 in scale_params
    )
    bounds_in = []
    for need, thr in bounds:
        nb = jnp.stack([need, thr], axis=-1)  # (B, M, 2)
        nb = jnp.take_along_axis(nb, order[..., None], axis=1)
        bounds_in.append(
            jnp.pad(nb, ((0, 0), (0, Mp - M), (0, 0))).reshape(B * G, tm, 2)
        )

    sup = [
        jnp.pad(xyz[..., i], ((0, 0), (0, Np - N)), constant_values=1e12).reshape(B, nch, 1, _CHUNK)
        for i in range(3)
    ]
    qry = [jnp.pad(new_xyz[..., i], ((0, 0), (0, Mp - M))).reshape(B * G, 1, tm) for i in range(3)]

    raw_in = []
    if raw is not None:
        # raw is CHANNEL-MAJOR (B, C0, N[p]): channel-minor layout would pad
        # C0 (6-8) to 128 lanes in HBM — an 18x blowup that re-creates the A
        # planes this mode exists to delete. Zero pad columns give zero A
        # rows after the in-kernel dot, exactly what the kernel pad wrote.
        assert raw.shape[-1] in (N, Np), (raw.shape, N, Np)
        raw_in.append(
            jnp.pad(raw, ((0, 0), (0, 0), (0, Np - raw.shape[-1])))
            .reshape(B, raw.shape[1], nch // step, step * _CHUNK)
        )
    A_in, bq_in, a0_in, b0_in, w1_in, a1_in, b1_in = [], [], [], [], [], [], []
    for A, Bq, a0, b0, W1, a1, b1 in scale_params:
        if raw is not None:
            A_in.append(A[None])  # (1, C0, C1) layer-1 weight
        else:
            # pair-major when chunk-pairing: (nch/step, step*CHUNK, C).
            # A may arrive pre-padded to Np rows (see
            # ball_query_group_mlp_pallas) — a pad here would materialize
            # copy+pad HLO temps of the plane.
            assert A.shape[1] in (N, Np), (A.shape, N, Np)
            A_in.append(jnp.pad(A, ((0, 0), (0, Np - A.shape[1]), (0, 0))).reshape(B, nch // step, step * _CHUNK, -1))
        bq_in.append(
            jnp.pad(Bq.astype(jnp.float32), ((0, 0), (0, Mp - M), (0, 0))).reshape(B * G, tm, -1)
        )
        a0_in.append(a0.reshape(1, 1, -1).astype(jnp.float32))
        b0_in.append(b0.reshape(1, 1, -1).astype(jnp.float32))
        w1_in.append(W1[None])
        a1_in.append(a1.reshape(1, 1, -1).astype(jnp.float32))
        b1_in.append(b1.reshape(1, 1, -1).astype(jnp.float32))

    grid = (B, G)
    qspec = pl.BlockSpec((1, 1, tm), lambda b, m: (b * G + m, 0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, nch, 1, _CHUNK), lambda b, m: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    vec_spec = lambda v: pl.BlockSpec(v.shape, lambda b, m: (0, 0, 0), memory_space=pltpu.VMEM)
    if raw is not None:
        A_specs = [vec_spec(w0) for w0 in A_in]
        raw_specs = [
            pl.BlockSpec((1, raw_in[0].shape[1], nch // step, step * _CHUNK),
                         lambda b, m: (b, 0, 0, 0), memory_space=pltpu.VMEM)
        ]
        c1s = [w0.shape[-1] for w0 in A_in]
    else:
        A_specs = [
            pl.BlockSpec((1, nch // step, step * _CHUNK, A.shape[-1]), lambda b, m: (b, 0, 0, 0), memory_space=pltpu.VMEM)
            for A in A_in
        ]
        raw_specs = []
        c1s = [A.shape[-1] for A in A_in]
    bq_specs = [
        pl.BlockSpec((1, tm, q.shape[-1]), lambda b, m: (b * G + m, 0, 0), memory_space=pltpu.VMEM)
        for q in bq_in
    ]
    bspec = pl.BlockSpec((1, tm, 2), lambda b, m: (b * G + m, 0, 0), memory_space=pltpu.VMEM)
    out_specs = tuple(
        pl.BlockSpec((1, tm, w.shape[-1]), lambda b, m: (b * G + m, 0, 0), memory_space=pltpu.VMEM)
        for w in w1_in
    )
    out_shapes = tuple(
        jax.ShapeDtypeStruct((B * G, tm, w.shape[-1]), A.dtype) for w, (A, *_r) in zip(w1_in, scale_params)
    )

    a_scr = (
        [pltpu.VMEM((nch // step, step * _CHUNK, c1), scale_params[0][0].dtype) for c1 in c1s]
        if raw is not None else []
    )
    outs = pl.pallas_call(
        _make_group_mlp_kernel_v4(scales, tm, subtile, nch, pair_chunks, raw is not None),
        grid=grid,
        in_specs=[qspec, qspec, qspec, sspec, sspec, sspec,
                  *A_specs, *bq_specs,
                  *[vec_spec(v) for v in a0_in], *[vec_spec(v) for v in b0_in],
                  *[vec_spec(v) for v in w1_in],
                  *[vec_spec(v) for v in a1_in], *[vec_spec(v) for v in b1_in],
                  *[bspec] * len(scales), *raw_specs],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((nch, subtile, _CHUNK), jnp.float32),
            *a_scr,
            *[pltpu.VMEM((ns, tm, c1), jnp.float32) for (_r, ns), c1 in zip(scales, c1s)],
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=80 * 1024 * 1024),
        interpret=interpret,
    )(*qry, *sup, *A_in, *bq_in, *a0_in, *b0_in, *w1_in, *a1_in, *b1_in, *bounds_in, *raw_in)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    outs = tuple(o.reshape(B, Mp, -1)[:, :M] for o in outs)
    return tuple(jnp.take_along_axis(o, inv_order[..., None], axis=1) for o in outs)


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
