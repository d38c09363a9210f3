"""A/B the SA1 train stage (fwd+bwd) at bench rel shapes: gated vs ungated.

The round-3 train gating landed slower end-to-end (9.2 -> 8.2 scenes/s at
S=8) — this isolates where the step's time actually goes: the SA1 grouping
kernels (old merged vs new gated+sorted), the post BN/MLP/maxpool chain,
and their VJPs. eval_subtile=0 turns the v4/gated path off inside the SAME
module code, so the two variants differ only in what we changed.

Run alone on the chip: python scripts/bench_train_stage.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/or4d_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def t(f, iters=6):
    float(f())  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f())
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from or4d_tpu.models.pointnet2 import SAScale, SetAbstractionMSG

    B, N, M = 640, 8000, 512  # packed rel rows at S=8 bench shapes
    rng = np.random.default_rng(0)
    xyz = jnp.asarray((rng.standard_normal((B, N, 3)) * 0.5).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((B, N, 4)).astype(np.float32)).astype(jnp.bfloat16)
    mask = jnp.ones((B,), jnp.float32)
    scales = (SAScale(0.1, 16, (64, 64)), SAScale(0.2, 32, (64, 128)))

    for name, subtile in (("gated(v4 counts)", 32), ("ungated(old)", 0)):
        mod = SetAbstractionMSG(npoint=M, scales=scales, fused_mode="train_kernel",
                                eval_subtile=subtile, dtype=jnp.bfloat16)
        # init on a tiny batch (params/stats are batch-independent); a full-
        # shape eager init materializes every intermediate and OOMs the chip
        v = jax.jit(lambda x, f: mod.init(jax.random.key(0), x, f,
                                          mask=mask[:8], train=True))(xyz[:8], feats[:8])

        def fwd_loss(params, bs, x, f):
            (nx, out), mut = mod.apply({"params": params, "batch_stats": bs},
                                       x, f, mask=mask, train=True,
                                       mutable=["batch_stats"])
            return (out.astype(jnp.float32) ** 2).sum(), mut

        fwd = jax.jit(lambda p, bs, x, f: fwd_loss(p, bs, x, f)[0])
        grad = jax.jit(lambda p, bs, x, f: jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(jnp.abs(g.astype(jnp.float32))),
            jax.grad(lambda q: fwd_loss(q, bs, x, f)[0])(p), 0.0))
        ms_f = t(lambda: fwd(v["params"], v["batch_stats"], xyz, feats))
        ms_fb = t(lambda: grad(v["params"], v["batch_stats"], xyz, feats))
        print(f"{name:18s} fwd {ms_f:7.1f} ms   fwd+bwd {ms_fb:7.1f} ms")

    # raw grouping kernels, isolated from the BN/MLP chain
    from or4d_tpu.ops.pallas_ball_query import (
        _counts_to_bounds,
        ball_query_group_pallas,
        ball_query_group_pallas_gated,
        bounds_order_key_argsort,
    )
    from or4d_tpu.ops.pallas_fps import furthest_point_sample_with_counts

    spec = tuple((sc.radius, sc.nsample) for sc in scales)
    A1 = feats[..., :4].astype(jnp.bfloat16)
    A = jnp.concatenate([A1] * 16, axis=-1)  # (B, N, 64) like the layer-1 planes

    def prep(x):
        idx, counts = furthest_point_sample_with_counts(x, M, tuple(r for r, _ in spec))
        q = jnp.take_along_axis(x, idx[..., None], axis=1)
        bounds = _counts_to_bounds(spec, counts)
        order = bounds_order_key_argsort(spec, bounds)
        qs = jnp.take_along_axis(q, order[..., None], axis=1)
        bs = tuple((jnp.take_along_axis(nd, order, axis=1), jnp.take_along_axis(th, order, axis=1))
                   for nd, th in bounds)
        return q, qs, bs

    q, qs, bs = jax.jit(prep)(xyz)

    gf = jax.jit(lambda x, a, q_: sum(o.astype(jnp.float32).sum()
                 for o in ball_query_group_pallas(spec, x, q_, (a, a), False)))
    print(f"raw ungated fwd kernel      {t(lambda: gf(xyz, A, q)):7.1f} ms")
    gg = jax.jit(lambda x, a, q_, b: sum(o.astype(jnp.float32).sum()
                 for o in ball_query_group_pallas_gated(spec, x, q_, (a, a), b, False)))
    print(f"raw gated fwd kernel        {t(lambda: gg(xyz, A, qs, bs)):7.1f} ms")

    bf = jax.jit(lambda x, a, q_: jnp.abs(jax.grad(
        lambda aa: sum(jnp.tanh(o.astype(jnp.float32)).sum()
                       for o in ball_query_group_pallas(spec, x, q_, (aa, aa), False)))(a)).sum())
    print(f"raw ungated fwd+bwd kernel  {t(lambda: bf(xyz, A, q)):7.1f} ms")
    bg = jax.jit(lambda x, a, q_, b: jnp.abs(jax.grad(
        lambda aa: sum(jnp.tanh(o.astype(jnp.float32)).sum()
                       for o in ball_query_group_pallas_gated(spec, x, q_, (aa, aa), b, False)))(a)).sum())
    print(f"raw gated fwd+bwd kernel    {t(lambda: bg(xyz, A, qs, bs)):7.1f} ms")


if __name__ == "__main__":
    main()
