"""Fused serving-mode SA1 kernel v2: channel-major cached planes -> pooled
features in one VMEM pass.

Serving eval (or4d_tpu/serving.py) replaces SA1's FPS/ball-query/selection
work with precomputed grouped ``[p_abs | f]`` planes; the remaining
weights-dependent chain per scale is

    max_s relu(a1 * (relu(a0 * (bf16(g_s @ W0) - Bq) + b0) @ W1) + b1)

(reference SharedMLP semantics, pointnet2_modules.py:9-19 + the eval-BN
fold). The XLA formulation (DelayedSharedMLP.from_grouped) materializes the
(B, M, ns, C1) and (B, M, ns, C2) intermediates in HBM — measured 129 ms of
the 215 ms S=64 serving forward (scripts/bench_serving.py, 2026-08-19)
against a ~15 ms roofline. This kernel keeps the whole chain in VMEM with a
running max over slots, so HBM traffic collapses to the cached planes in and
the (B, M, C2) pooled output out.

Why the round-4 attempt (``serving_fused``, deleted 9b39422) lost 26%: it
streamed the cached planes in their natural (B, M, ns, C0) layout — C0=7 in
the LANE dimension, 7/128 lane utilization, an ~18x HBM read blowup, plus
per-slot strided (tm, C0) sublane loads. This kernel uses the raw-mode
kernels' proven CHANNEL-MAJOR layout instead: planes arrive (B, ns, C0p, M)
with the 512 queries filling the lanes and the C0p=8 padded channels in
sublanes, and the layer-1 matmul contracts over the C0 sublane dim
(``dot_general`` ``(((0,), (0,)), ((), ()))`` — the pattern
pallas_ball_query.py's from_raw path measures bit-exact on-chip).

Arithmetic mirrors the fused v4 raw eval kernel end to end: A materialized
as bf16(f32-accumulated ``g_s @ W0``) exactly like the in-VMEM A planes, Bq
and the folded eval-BN affines recovered by the same module probes
(DelayedSharedMLP.bq_term / fused_eval_params), f32 accumulation on both
dots, slot max in f32 in slot order. First-hit-filled padded slots duplicate
slot 1's plane bit-for-bit in the cache, so they never change the max — the
same invariant the cold kernel's ``where(total >= k, ...)`` fill enforces.
Serving SA1 output is therefore bit-identical to the cold fused eval kernel
on the same geometry (up to +/-0 signs that the relu washes out); the
on-chip gate (scripts/check_serving_kernel_tpu.py) asserts it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(ns: int):
    def kernel(g_ref, bq_ref, w0_ref, a0_ref, b0_ref, w1_ref, a1_ref, b1_ref, out_ref):
        W0 = w0_ref[0]  # (C0p, C1) — layer-1 weight, zero rows at pad channels
        Bq = bq_ref[0].astype(jnp.float32)  # (M, C1)
        a0 = a0_ref[0]  # (1, C1) f32 folded eval-BN0 affine
        b0 = b0_ref[0]
        W1 = w1_ref[0]  # (C1, C2)
        a1 = a1_ref[0]  # (1, C2) f32 folded eval-BN1 affine
        b1 = b1_ref[0]
        A_dtype = W0.dtype
        best = None
        for s in range(ns):
            # A materialized in VMEM from the channel-major plane: bf16
            # inputs, f32 accumulation, bf16 round — the same arithmetic as
            # the cold kernel's from_raw A build (zero pad channels add
            # exact zeros)
            A = jax.lax.dot_general(
                g_ref[0, s], W0, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(A_dtype)  # (M, C1)
            val = A.astype(jnp.float32)
            h = jnp.maximum((val - Bq) * a0 + b0, 0.0)
            hw = jnp.dot(h.astype(W1.dtype), W1, preferred_element_type=jnp.float32)
            o = jnp.maximum(hw * a1 + b1, 0.0)  # (M, C2) f32
            best = o if best is None else jnp.maximum(best, o)
        out_ref[0] = best.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnums=(8,))
def serving_sa1_mlp_pallas(
    grouped_cm: jax.Array,  # (B, ns, C0p, M) channel-major cached [p_abs|f] planes
    Bq: jax.Array,          # (B, M, C1) per-query dense0 term (bq_term output)
    W0: jax.Array,          # (C0, C1) layer-1 weight (w0_matrix output)
    a0: jax.Array, b0: jax.Array,  # (C1,) folded eval-BN0 affine
    W1: jax.Array,          # (C1, C2) dense1 kernel
    a1: jax.Array, b1: jax.Array,  # (C2,) folded eval-BN1 affine
    interpret: bool = False,
) -> jax.Array:
    """One SA1 scale of the serving fast path -> (B, M, C2) pooled features.

    ``grouped_cm`` is the serving cache's channel-major layout
    (serving.build_sa1_cache(channel_major=True)): queries in lanes,
    zero-padded channels in sublanes. ``W0`` rows beyond C0 are zero-padded
    here to match the plane's C0p.
    """
    B, ns, C0p, M = grouped_cm.shape
    C0, C1 = W0.shape
    C2 = W1.shape[1]
    assert C0 <= C0p, (C0, C0p)
    W0p = jnp.pad(W0, ((0, C0p - C0), (0, 0)))
    Mp = _round_up(M, 8)
    if Mp != M:
        grouped_cm = jnp.pad(grouped_cm, ((0, 0), (0, 0), (0, 0), (0, Mp - M)))
        Bq = jnp.pad(Bq, ((0, 0), (0, Mp - M), (0, 0)))

    rep3 = lambda v: pl.BlockSpec(v.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    vecs = [v.reshape(1, 1, -1).astype(jnp.float32) for v in (a0, b0, a1, b1)]
    out = pl.pallas_call(
        _make_kernel(ns),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ns, C0p, Mp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, C1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            rep3(W0p[None]),
            rep3(vecs[0]), rep3(vecs[1]),
            rep3(W1[None]),
            rep3(vecs[2]), rep3(vecs[3]),
        ],
        out_specs=pl.BlockSpec((1, Mp, C2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Mp, C2), W0.dtype),
        interpret=interpret,
    )(grouped_cm, Bq, W0p[None], vecs[0], vecs[1], W1[None], vecs[2], vecs[3])
    return out[:, :M]
