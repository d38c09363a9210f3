"""On-chip A/B: round-3 two-gate kernel vs v4 (FPS-fused bounds, lazy
in-loop d2/prefix, chunk pairing), on real bench geometry. Run alone."""

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
        _counts_to_bounds,
        ball_query_group_mlp_pallas,
        ball_query_group_mlp_pallas_v4,
    )
    from or4d_tpu.ops.pallas_fps import furthest_point_sample_pallas, furthest_point_sample_with_counts

    rows = 640
    ds = DatasetConfig()
    batch = make_scene_batch(num_scenes=6, seed=0, n_objects=9, ds=ds, points_per_obj=2000)
    rel = np.asarray(batch.rel_points)
    mask = np.asarray(batch.edge_mask).astype(bool)
    clouds = rel[mask][:, :, :3].astype(np.float32)
    reps = -(-rows // len(clouds))
    clouds = np.concatenate([clouds] * reps)[:rows]
    xyz = jax.device_put(jnp.asarray(clouds))
    scales = ((0.1, 16), (0.2, 32))

    t_fps = timeit(lambda x: furthest_point_sample_pallas(x, 512).sum(), xyz, tag="FPS plain (640x8000->512)")
    t_fpsc = timeit(
        lambda x: sum(c.sum() for c in furthest_point_sample_with_counts(x, 512, (0.1, 0.2))[1]),
        xyz, tag="FPS + fused counts",
    )
    print(f"{'counts overhead':56s} {t_fpsc - t_fps:9.2f} ms", flush=True)

    idx, counts = furthest_point_sample_with_counts(xyz, 512, (0.1, 0.2))
    q = jnp.take_along_axis(xyz, idx[..., None], axis=1)
    bounds = jax.jit(lambda c: _counts_to_bounds(scales, c), static_argnums=())(tuple(counts))
    jax.block_until_ready((q, bounds))

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

    timeit(lambda x, nq, p: ball_query_group_mlp_pallas(scales, x, nq, p, False, None, False, 32),
           xyz, q, params, tag="round-3 two-gate subtile=32 (incl. pre-pass+sort)")
    for pair in (True, False):
        timeit(
            lambda x, nq, p, b, pair=pair: ball_query_group_mlp_pallas_v4(scales, x, nq, p, b, False, None, 32, pair),
            xyz, q, params, bounds, tag=f"v4 bounds-as-inputs pair_chunks={pair}",
        )
    for st in (64,):
        timeit(
            lambda x, nq, p, b, st=st: ball_query_group_mlp_pallas_v4(scales, x, nq, p, b, False, None, st, True),
            xyz, q, params, bounds, tag=f"v4 pair subtile={st}",
        )
    # v4 parity vs the round-3 kernel on-chip (bit-exactness)
    o3 = ball_query_group_mlp_pallas(scales, xyz, q, params, False, None, False, 32)
    o4 = ball_query_group_mlp_pallas_v4(scales, xyz, q, params, bounds, False, None, 32, True)
    for s in range(2):
        a, b = np.asarray(o3[s], np.float32), np.asarray(o4[s], np.float32)
        print(f"scale {s}: max abs diff {np.abs(a - b).max():.3e} (bit-exact expected)")


if __name__ == "__main__":
    main()
