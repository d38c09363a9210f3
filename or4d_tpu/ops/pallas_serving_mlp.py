"""Fused serving-mode SA1 MLP kernel (cached grouped planes -> pooled
features in one VMEM pass).

Serving eval (or4d_tpu/serving.py) replaces the SA1 ball-query/selection
work with precomputed grouped ``[p_abs | f]`` planes; the remaining
weights-dependent chain is

    max_s relu(a1 * (relu(a0 * (g_s @ W0 - Bq) + b0) @ W1) + b1)

— two matmuls with elementwise glue and a slot max. The XLA formulation
(DelayedSharedMLP.from_grouped) materializes every intermediate grouped
tensor in HBM: at paper shapes the (B, M, ns, C1) and (B, M, ns, C2) stages
are multi-GB per batch, several times the 315 MB the cached planes
themselves stream. This kernel keeps the whole chain in VMEM with a RUNNING
max over slots — rank-2 ops only, nothing wider than one (TM, ns, C0) input
tile ever lives anywhere — so HBM traffic collapses to the cached planes in
and the (B, M, C2) pooled output out.

Arithmetic mirrors the fused eval kernel's epilogue
(pallas_ball_query.py:1024-1027: folded-BN affines recovered by module
probes, f32 accumulation on both dots) with one extra leading dot for the
cached pre-dense0 planes; the slot max is exactly associative, so the
running-max formulation is not a reassociation.

Opt-in (`TPUConfig.serving_fused` / bench `--serving-fused`) until measured
on-chip, like every other kernel lever.
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
        Bq = bq_ref[0]  # (tm, C1) f32
        W0 = w0_ref[0]  # (C0, C1)
        W1 = w1_ref[0]  # (C1, C2)
        a0 = a0_ref[0]  # (1, C1) f32
        b0 = b0_ref[0]
        a1 = a1_ref[0]  # (1, C2) f32
        b1 = b1_ref[0]
        best = None
        for s in range(ns):
            g = g_ref[0, :, s, :]  # (tm, C0)
            val = jnp.dot(g, W0, preferred_element_type=jnp.float32)  # (tm, C1) f32
            h = jnp.maximum((val - Bq) * a0 + b0, 0.0)
            hw = jnp.dot(h.astype(W1.dtype), W1, preferred_element_type=jnp.float32)
            o = jnp.maximum(hw * a1 + b1, 0.0)  # (tm, C2) f32
            best = o if best is None else jnp.maximum(best, o)
        out_ref[0] = best.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnums=(8,))
def serving_sa1_mlp_pallas(
    grouped: jax.Array,  # (B, M, ns, C0) cached [p_abs | f] planes
    Bq: jax.Array,       # (B, M, C1) per-query dense0 subtraction term
    W0: jax.Array,       # (C0, C1) dense0 kernel
    a0: jax.Array, b0: jax.Array,  # (C1,) folded eval-BN0 affine
    W1: jax.Array,       # (C1, C2) dense1 kernel
    a1: jax.Array, b1: jax.Array,  # (C2,) folded eval-BN1 affine
    interpret: bool = False,
) -> jax.Array:
    """One SA1 scale of the serving fast path -> (B, M, C2) pooled features."""
    B, M, ns, C0 = grouped.shape
    C1 = W0.shape[1]
    C2 = W1.shape[1]
    tm = min(512, _round_up(M, 8))
    Mp = _round_up(M, tm)
    G = Mp // tm
    if Mp != M:
        grouped = jnp.pad(grouped, ((0, 0), (0, Mp - M), (0, 0), (0, 0)))
        Bq = jnp.pad(Bq, ((0, 0), (0, Mp - M), (0, 0)))
    g_in = grouped.reshape(B * G, tm, ns, C0)
    bq_in = Bq.astype(jnp.float32).reshape(B * G, tm, C1)
    w0_in = W0[None]
    w1_in = W1[None]
    vecs = [v.reshape(1, 1, -1).astype(jnp.float32) for v in (a0, b0, a1, b1)]

    row = lambda shape: pl.BlockSpec(shape, lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(ns),
        grid=(B * G,),
        in_specs=[
            pl.BlockSpec((1, tm, ns, C0), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            row((1, tm, C1)),
            rep((1, C0, C1)),
            rep((1, 1, C1)), rep((1, 1, C1)),
            rep((1, C1, C2)),
            rep((1, 1, C2)), rep((1, 1, C2)),
        ],
        out_specs=row((1, tm, C2)),
        out_shape=jax.ShapeDtypeStruct((B * G, tm, C2), grouped.dtype),
        interpret=interpret,
    )(g_in, bq_in, w0_in, *vecs[:2], w1_in, *vecs[2:])
    return out.reshape(B, Mp, C2)[:, :M]
