"""On-chip A/B of the fused eval SA kernel: static unroll vs two-gate
sub-tiling (with the exact bounds pre-pass + composite-key query sort), on
REAL bench geometry (synthetic scenes -> rel clouds -> FPS centroids), where
the straggler structure matches the end-to-end benchmark. Run alone."""

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
    print(f"{tag:52s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    from or4d_tpu import ops
    from or4d_tpu.config import DatasetConfig
    from or4d_tpu.data.synthetic import make_scene_batch
    from or4d_tpu.ops.pallas_ball_query import (
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

    for rb, cm in ((1, "matmul"), (1, "lanesum")):
        timeit(
            lambda x, nq, rb=rb, cm=cm: sum(
                a.sum() + b.sum() for a, b in ball_query_bounds_pallas(scales, x, nq, False, rb, cm)
            ),
            xyz, q, tag=f"bounds pre-pass rb={rb} {cm}",
        )
    t0 = timeit(lambda x, nq, p: ball_query_group_mlp_pallas(scales, x, nq, p),
                xyz, q, params, tag="static unroll (current default)")
    for st in (32,):
        timeit(lambda x, nq, p, st=st: ball_query_group_mlp_pallas(scales, x, nq, p, False, None, False, st),
               xyz, q, params, tag=f"two-gate subtile={st} (incl. pre-pass+sort)")


if __name__ == "__main__":
    main()
