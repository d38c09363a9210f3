"""Microbench: gated fused group+MLP eval kernel — tile size x sorting A/B.

SA1-rel shapes (640 rows x 512 queries x 8000 pts, two scales). Run alone on
the real chip.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/or4d_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, iters=6, warmup=2, tag=""):
    for _ in range(warmup):
        float(jnp.asarray(jax.tree_util.tree_leaves(fn(*args))[0]).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.asarray(jax.tree_util.tree_leaves(fn(*args))[0]).astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:48s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    from or4d_tpu.ops.pallas_ball_query import ball_query_group_mlp_pallas

    B, N, M, C1, C2 = 640, 8000, 512, 64, 128
    keys = jax.random.split(jax.random.key(0), 8)
    xyz = jax.random.normal(keys[0], (B, N, 3), jnp.float32) * 0.4
    q = xyz[:, :M, :]
    scales = ((0.1, 16), (0.2, 32))

    def params(kbase, Cout):
        A = jax.random.normal(keys[kbase], (B, N, C1), jnp.bfloat16)
        Bq = jax.random.normal(keys[kbase + 1], (B, M, C1), jnp.float32)
        a0 = jnp.ones((C1,), jnp.float32)
        b0 = jnp.zeros((C1,), jnp.float32)
        W1 = jax.random.normal(keys[kbase + 2], (C1, Cout), jnp.bfloat16) * 0.1
        a1 = jnp.ones((Cout,), jnp.float32)
        b1 = jnp.zeros((Cout,), jnp.float32)
        return (A, Bq, a0, b0, W1, a1, b1)

    p1 = params(1, C2)
    p2 = params(4, C2)
    jax.block_until_ready((xyz, q, p1, p2))

    for tm, gate in ((512, False), (512, True), (256, True), (128, True)):
        timeit(
            lambda x, nq: ball_query_group_mlp_pallas(scales, x, nq, (p1, p2), False, tm, gate),
            xyz, q, tag=f"fused eval stage tm={tm} gate={gate}",
        )


if __name__ == "__main__" and "--diag" not in sys.argv:
    main()


def diag():
    """All-dense diagnostic: at r=0.9 every query fills its slots within the
    first chunk — if the dynamic gate works, this must be far faster than
    the r=0.1 case at the same tile size."""
    from or4d_tpu.ops.pallas_ball_query import ball_query_group_mlp_pallas

    B, N, M, C1, C2 = 640, 8000, 512, 64, 128
    keys = jax.random.split(jax.random.key(1), 4)
    xyz = jax.random.normal(keys[0], (B, N, 3), jnp.float32) * 0.4
    q = xyz[:, :M, :]
    A = jax.random.normal(keys[1], (B, N, C1), jnp.bfloat16)
    Bq = jax.random.normal(keys[2], (B, M, C1), jnp.float32)
    W1 = jax.random.normal(keys[3], (C1, C2), jnp.bfloat16) * 0.1
    p = (A, Bq, jnp.ones((C1,)), jnp.zeros((C1,)), W1, jnp.ones((C2,)), jnp.zeros((C2,)))
    jax.block_until_ready((xyz, q, p))
    for r in (0.9, 0.1):
        timeit(
            lambda x, nq: ball_query_group_mlp_pallas(((r, 16),), x, nq, (p,), False, 512, True),
            xyz, q, tag=f"single-scale r={r} ns=16 tm=512 gated",
        )


if __name__ == "__main__" and "--diag" in sys.argv:
    diag()


def fps_ab():
    from or4d_tpu.ops.pallas_fps import furthest_point_sample_pallas

    xyz = jax.random.normal(jax.random.key(0), (640, 8000, 3), jnp.float32) * 0.4
    jax.block_until_ready(xyz)
    for rows in (8, 16, 32, 64):
        timeit(
            lambda x: furthest_point_sample_pallas(x, 512, False, rows).sum(),
            xyz, tag=f"FPS 640x8000 -> 512, rows={rows}",
        )


if __name__ == "__main__" and "--fps" in sys.argv:
    fps_ab()
