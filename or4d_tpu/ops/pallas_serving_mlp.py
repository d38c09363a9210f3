"""Fused serving-mode SA1 kernel: channel-major cached planes -> pooled
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

Layout history (PERF.md round-8):

* round-4 attempt (``serving_fused``, deleted 9b39422): streamed the cached
  planes in their natural (B, M, ns, C0) layout — C0=7 in the LANE
  dimension, 7/128 lane utilization, an ~18x HBM read blowup. Lost 26%.
* v2 (d2f9a26): CHANNEL-MAJOR (B, ns, C0p, M) planes — queries in lanes,
  zero-padded channels in sublanes, the layer-1 matmul contracting over the
  C0 sublane dim (``dot_general`` ``(((0,), (0,)), ((), ()))``, the pattern
  pallas_ball_query.py's from_raw path measures bit-exact on-chip). Won 23%
  end to end (serving 297 -> 367.5 scenes/s) but issued ``ns`` tiny
  (M, C1)-output dots per row — ~1.1 us per slot, dispatch-bound (85 ms of
  the 174 ms S=64 serving forward for obj+rel).
* v3 (this file): SLOT-FLATTENED channel-major (B, C0p, ns*Mp) — the slots
  ride the LANE dimension next to the queries, so the layer-1 dot computes a
  whole chunk of slots in ONE (chunk*Mp, C1) MXU op, the affine/ReLU/W1
  chain runs on (chunk*Mp, C) tiles, and the slot max folds chunk results
  with static sublane slices. Identical arithmetic to v2 (each output row
  still contracts only its own C0 channels; the slot max is exact in f32,
  order-free), so serving stays BIT-EQUAL to the cold fused eval path.

Arithmetic mirrors the fused v4 raw eval kernel end to end: A materialized
as bf16(f32-accumulated ``g_s @ W0``) exactly like the in-VMEM A planes, Bq
and the folded eval-BN affines recovered by the same module probes
(DelayedSharedMLP.bq_term / fused_eval_params), f32 accumulation on both
dots, slot max in f32. First-hit-filled padded slots duplicate slot 1's
plane bit-for-bit in the cache, so they never change the max — the same
invariant the cold kernel's ``where(total >= k, ...)`` fill enforces. The
on-chip gate (scripts/check_serving_kernel_tpu.py) asserts the bit
equality.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _chunk_slots(ns: int, Mp: int) -> int:
    """Slots per MXU chunk: big enough to amortize per-dot latency, small
    enough that the chain's f32 intermediates stay a few MB (the on-chip
    chunk sweep at Mp=512: 4 slots 33.9 ms, 1 slot 35.0, 8 slots 36.1,
    16 slots 36.9 — VMEM pressure beats dot-count past ~2k rows/dot)."""
    c = max(1, 2048 // Mp)
    while ns % c:
        c -= 1
    return min(c, ns)


def _rows_per_program(B: int) -> int:
    """Row-block size: each grid program owns RB rows so their INDEPENDENT
    chain iterations interleave (one row's chain is latency-bound: ~27 us
    per row-program measured vs ~3 us of dot work) and program count drops
    RB-fold. Largest power of two <= 8 dividing B, so no row padding."""
    rb = 8
    while B % rb:
        rb //= 2
    return rb


def _make_kernel(ns: int, Mp: int, chunk: int, rb: int):
    def kernel(g_ref, bq_ref, w0_ref, a0_ref, b0_ref, w1_ref, a1_ref, b1_ref, out_ref):
        W0 = w0_ref[0]  # (C0p, C1) — layer-1 weight, zero rows at pad channels
        a0 = a0_ref[0]  # (1, C1) f32 folded eval-BN0 affine
        b0 = b0_ref[0]
        W1 = w1_ref[0]  # (C1, C2)
        a1 = a1_ref[0]  # (1, C2) f32 folded eval-BN1 affine
        b1 = b1_ref[0]
        C1 = W0.shape[1]
        A_dtype = W0.dtype
        # iteration order (chunk outer, row inner) puts the rb INDEPENDENT
        # per-row chains adjacent so the scheduler can overlap their dot
        # latencies; `best` carries rb running maxes
        best = [None] * rb
        for c in range(ns // chunk):
            for r in range(rb):
                # one MXU op materializes A for a whole chunk of slots: bf16
                # inputs, f32 accumulation, bf16 round — the same arithmetic
                # as the cold kernel's from_raw A build (zero pad channels
                # add exact zeros). Lane offsets are Mp multiples (aligned).
                gs = g_ref[r][:, c * chunk * Mp : (c + 1) * chunk * Mp]  # (C0p, chunk*Mp)
                A = jax.lax.dot_general(
                    gs, W0, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(A_dtype)  # (chunk*Mp, C1)
                # Bq applied per slot by rank-3 broadcast (row s*Mp+m of the
                # chunk is (slot s, query m)) — no tiled-Bq VMEM copy
                Bq = bq_ref[r].astype(jnp.float32)  # (Mp, C1)
                val = A.astype(jnp.float32).reshape(chunk, Mp, C1)
                h = jnp.maximum((val - Bq[None]) * a0[None] + b0[None], 0.0)
                h = h.reshape(chunk * Mp, C1)
                hw = jnp.dot(h.astype(W1.dtype), W1, preferred_element_type=jnp.float32)
                o = jnp.maximum(hw * a1 + b1, 0.0)  # (chunk*Mp, C2) f32
                for s in range(chunk):
                    os = o[s * Mp : (s + 1) * Mp]  # static sublane slice
                    best[r] = os if best[r] is None else jnp.maximum(best[r], os)
        for r in range(rb):
            out_ref[r] = best[r].astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnums=(8, 9, 10, 11))
def serving_sa1_mlp_pallas(
    grouped_cm: jax.Array,  # (B, C0p, ns*Mp) slot-flattened channel-major planes
    Bq: jax.Array,          # (B, M, C1) per-query dense0 term (bq_term output)
    W0: jax.Array,          # (C0, C1) layer-1 weight (w0_matrix output)
    a0: jax.Array, b0: jax.Array,  # (C1,) folded eval-BN0 affine
    W1: jax.Array,          # (C1, C2) dense1 kernel
    a1: jax.Array, b1: jax.Array,  # (C2,) folded eval-BN1 affine
    ns: int = 0,
    interpret: bool = False,
    chunk: int = 0,  # slots per MXU chunk; 0 = auto (_chunk_slots)
    rows: int = 0,  # rows per grid program; 0 = auto (_rows_per_program)
) -> jax.Array:
    """One SA1 scale of the serving fast path -> (B, M, C2) pooled features.

    ``grouped_cm`` is the serving cache's slot-flattened channel-major
    layout (serving.build_sa1_cache(channel_major=True)): lane index
    s*Mp + m holds (slot s, query m), zero-padded channels in sublanes,
    queries zero-padded to Mp = round_up(M, 8). ``W0`` rows beyond C0 are
    zero-padded here to match the plane's C0p. ``ns`` (static) is the
    scale's slot count.
    """
    B, C0p, nsMp = grouped_cm.shape
    C0, C1 = W0.shape
    C2 = W1.shape[1]
    M = Bq.shape[1]
    assert C0 <= C0p, (C0, C0p)
    assert ns > 0 and nsMp % ns == 0, (ns, nsMp)
    Mp = nsMp // ns
    assert Mp >= M and Mp % 8 == 0, (M, Mp)
    if chunk <= 0:
        chunk = _chunk_slots(ns, Mp)
    assert ns % chunk == 0, (ns, chunk)
    rb = _rows_per_program(B) if rows <= 0 else rows
    assert B % rb == 0, (B, rb)
    W0p = jnp.pad(W0, ((0, C0p - C0), (0, 0)))
    if Mp != M:
        Bq = jnp.pad(Bq, ((0, 0), (0, Mp - M), (0, 0)))

    rep3 = lambda v: pl.BlockSpec(v.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    vecs = [v.reshape(1, 1, -1).astype(jnp.float32) for v in (a0, b0, a1, b1)]
    out = pl.pallas_call(
        _make_kernel(ns, Mp, chunk, rb),
        grid=(B // rb,),
        in_specs=[
            pl.BlockSpec((rb, C0p, nsMp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, Mp, C1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            rep3(W0p[None]),
            rep3(vecs[0]), rep3(vecs[1]),
            rep3(W1[None]),
            rep3(vecs[2]), rep3(vecs[3]),
        ],
        out_specs=pl.BlockSpec((rb, Mp, C2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Mp, C2), W0.dtype),
        interpret=interpret,
    )(grouped_cm, Bq, W0p[None], vecs[0], vecs[1], W1[None], vecs[2], vecs[3])
    return out[:, :M]
