"""On-chip parity gate for the raw-mode gated TRAIN kernels (round 5): the
raw fwd must match the non-raw fwd, and the raw VJP's dW0 must match
autodiff through the explicit A = input @ W0 construction, at real bench
geometry. Run ALONE on the chip before any --train-raw benches."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/or4d_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from or4d_tpu.config import DatasetConfig
    from or4d_tpu.data.synthetic import make_scene_batch
    from or4d_tpu.ops.pallas_ball_query import (
        _counts_to_bounds,
        ball_query_group_pallas_gated,
        ball_query_group_pallas_gated_raw,
        bounds_order_key_argsort,
    )
    from or4d_tpu.ops.pallas_fps import furthest_point_sample_with_counts

    rows = 128
    ds = DatasetConfig()
    batch = make_scene_batch(num_scenes=2, seed=0, n_objects=9, ds=ds, points_per_obj=2000)
    rel = np.asarray(batch.rel_points)
    mask = np.asarray(batch.edge_mask).astype(bool)
    crops = rel[mask][:rows].astype(np.float32)  # (rows, 8000, 7)
    xyz = jax.device_put(jnp.asarray(crops[:, :, :3]))
    feats = jax.device_put(jnp.asarray(crops[:, :, 3:]))
    scales = ((0.1, 16), (0.2, 32))

    idx, counts = furthest_point_sample_with_counts(xyz, 512, (0.1, 0.2))
    q = jnp.take_along_axis(xyz, idx[..., None], axis=1)
    bounds = _counts_to_bounds(scales, tuple(counts))
    order = bounds_order_key_argsort(scales, bounds)
    q_s = jnp.take_along_axis(q, order[..., None], axis=1)
    bounds_s = tuple(
        (jnp.take_along_axis(nd, order, axis=1), jnp.take_along_axis(th, order, axis=1))
        for nd, th in bounds
    )
    jax.block_until_ready((q_s, bounds_s))

    rng = np.random.default_rng(0)
    C0 = 7
    w0s = tuple(
        jnp.asarray(rng.standard_normal((C0, 64)).astype(np.float32)).astype(jnp.bfloat16)
        for _ in scales
    )
    inp = jnp.concatenate([xyz, feats], axis=-1).astype(jnp.bfloat16)
    raw = jax.device_put(inp.transpose(0, 2, 1))

    def make_fns(ps):
        f_non = jax.jit(lambda ws, i: tuple(
            o.astype(jnp.float32) for o in ball_query_group_pallas_gated(
                scales, xyz, q_s, tuple(i @ w for w in ws), bounds_s, False, ps)))
        f_raw = jax.jit(lambda ws, r: tuple(
            o.astype(jnp.float32) for o in ball_query_group_pallas_gated_raw(
                scales, xyz, q_s, ws, r, bounds_s, False, ps)))

        def loss_raw(ws):
            outs = ball_query_group_pallas_gated_raw(scales, xyz, q_s, ws, raw, bounds_s, False, ps)
            return sum(jnp.sum(jnp.sin(o.astype(jnp.float32))) for o in outs)

        def loss_non(ws):
            outs = ball_query_group_pallas_gated(
                scales, xyz, q_s, tuple(inp @ w for w in ws), bounds_s, False, ps)
            return sum(jnp.sum(jnp.sin(o.astype(jnp.float32))) for o in outs)

        return f_non, f_raw, jax.jit(jax.grad(loss_non)), jax.jit(jax.grad(loss_raw))

    for ps in (True, False):
        f_non, f_raw, gnon, graw = make_fns(ps)
        # diffs computed ON DEVICE (bulk host pulls ride a very slow tunnel)
        diff_fn = jax.jit(lambda ws, i, r: [
            jnp.abs(a - b).max() for a, b in zip(f_non(ws, i), f_raw(ws, r))])
        diffs = [float(d) for d in diff_fn(w0s, inp, raw)]
        print(f"pack_slots={ps} fwd max|diff|:", diffs, flush=True)
        assert all(d < 1e-2 for d in diffs), "raw fwd diverges on-chip"

        gr = gnon(w0s)
        gn = graw(w0s)
        rels = []
        for a, b in zip(gr, gn):
            d = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
            r = float(jnp.abs(b.astype(jnp.float32)).max())
            rels.append(d / max(r, 1e-30))
        print(f"pack_slots={ps} dW0 rel diff:", rels, flush=True)
        assert all(x < 5e-2 for x in rels), "raw dW0 diverges on-chip"

    # timing: fwd and fwd+bwd, raw vs non-raw, at the gate shapes (ps=True)
    def t(fn, *a, iters=4):
        float(jnp.asarray(jax.tree_util.tree_leaves(fn(*a))[0]).astype(jnp.float32).sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            float(jnp.asarray(jax.tree_util.tree_leaves(fn(*a))[0]).astype(jnp.float32).sum())
        return (time.perf_counter() - t0) / iters * 1e3

    f_non, f_raw, gnon, graw = make_fns(True)
    print(f"fwd  non-raw {t(f_non, w0s, inp):8.1f} ms | raw {t(f_raw, w0s, raw):8.1f} ms", flush=True)
    print(f"grad non-raw {t(gnon, w0s):8.1f} ms | raw {t(graw, w0s):8.1f} ms", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
