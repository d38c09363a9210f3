"""Overhead decomposition probe for the two-gate sub-tiled eval kernel.

Hypothesis under test: the gated kernel's cost is dominated by Mosaic's
per-iteration dynamic-loop overhead (~us/iter), not by the gated selection
work itself. Pins the gate bounds to constants (debug_bounds — WRONG
results, timing only) and sweeps the iteration count to read slope
(per-iteration cost) and intercept (fixed cost: d2 tiles + tri prefix +
epilogue + launch overheads). Also times the XLA sort/permute machinery
around the kernel. Run alone on the chip.
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


def timeit(fn, *args, iters=6, warmup=2, tag=""):
    s = jax.jit(lambda *a: fn(*a))
    for _ in range(warmup):
        float(jnp.asarray(jax.tree_util.tree_leaves(s(*args))[0]).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.asarray(jax.tree_util.tree_leaves(s(*args))[0]).astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:56s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    from or4d_tpu import ops
    from or4d_tpu.config import DatasetConfig
    from or4d_tpu.data.synthetic import make_scene_batch
    from or4d_tpu.ops.pallas_ball_query import (
        _subtile_order_key,
        ball_query_bounds_pallas,
        ball_query_group_mlp_pallas,
    )

    rows = 640
    ds = DatasetConfig()
    batch = make_scene_batch(num_scenes=6, seed=0, n_objects=9, ds=ds, points_per_obj=2000)
    rel = np.asarray(batch.rel_points)
    mask = np.asarray(batch.edge_mask).astype(bool)
    clouds = rel[mask][:, :, :3].astype(np.float32)
    reps = -(-rows // len(clouds))
    clouds = np.concatenate([clouds] * reps)[:rows]
    xyz = jax.device_put(jnp.asarray(clouds))
    qidx = ops.furthest_point_sample(xyz, 512)
    q = jnp.take_along_axis(xyz, qidx[..., None], axis=1)
    jax.block_until_ready(q)

    scales = ((0.1, 16), (0.2, 32))
    rng = np.random.default_rng(0)
    params = []
    for c1, c2 in ((64, 64), (64, 128)):
        A = jax.device_put(jnp.asarray(rng.standard_normal((rows, 8000, c1)).astype(np.float32)).astype(jnp.bfloat16))
        Bq = jax.device_put(jnp.asarray(rng.standard_normal((rows, 512, c1)).astype(np.float32)))
        a0 = jnp.asarray(rng.standard_normal((c1,)).astype(np.float32))
        b0 = jnp.asarray(rng.standard_normal((c1,)).astype(np.float32))
        W1 = jnp.asarray(rng.standard_normal((c1, c2)).astype(np.float32)).astype(jnp.bfloat16)
        a1 = jnp.asarray(rng.standard_normal((c2,)).astype(np.float32))
        b1 = jnp.asarray(rng.standard_normal((c2,)).astype(np.float32))
        params.append((A, Bq, a0, b0, W1, a1, b1))
    params = tuple(params)
    jax.block_until_ready(params)

    # reference points (should hit the compile cache from earlier rounds)
    timeit(lambda x, nq, p: ball_query_group_mlp_pallas(scales, x, nq, p),
           xyz, q, params, tag="static unroll")
    t_norm = timeit(lambda x, nq, p: ball_query_group_mlp_pallas(scales, x, nq, p, False, None, False, 32),
                    xyz, q, params, tag="two-gate subtile=32 (normal)")

    # the XLA machinery around the kernel, in isolation
    timeit(lambda x, nq: sum(a.sum() + b.sum() for a, b in ball_query_bounds_pallas(scales, x, nq)),
           xyz, q, tag="bounds pre-pass alone")

    def sort_machinery(x, nq, p):
        key = _subtile_order_key(scales, x, nq)
        order = jnp.argsort(key, axis=1)
        inv = jnp.argsort(order, axis=1)
        nq2 = jnp.take_along_axis(nq, order[..., None], axis=1)
        tot = nq2.sum()
        for A, Bq, *_ in p:
            Bq2 = jnp.take_along_axis(Bq, order[..., None], axis=1)
            tot = tot + Bq2.sum()
        # inverse-permute two dummy per-query outputs (64/128 wide)
        o1 = jnp.take_along_axis(p[0][1], inv[..., None], axis=1)
        return tot + o1.sum()

    timeit(sort_machinery, xyz, q, params, tag="pre-pass + sort/permute machinery alone")

    # bound sweeps: chunk path (h pinned, all subtiles)
    for h in (1, 2, 4, 8):
        timeit(lambda x, nq, p, h=h: ball_query_group_mlp_pallas(scales, x, nq, p, False, None, False, 32, (h, 0)),
               xyz, q, params, tag=f"subtile=32 pinned chunk-gate h={h}")
    # slot path (cap pinned, all subtiles)
    for c in (2, 8):
        timeit(lambda x, nq, p, c=c: ball_query_group_mlp_pallas(scales, x, nq, p, False, None, False, 32, (0, c)),
               xyz, q, params, tag=f"subtile=32 pinned slot-gate cap={c}")


if __name__ == "__main__":
    main()
