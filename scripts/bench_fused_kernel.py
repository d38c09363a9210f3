"""Microbench: fused ball-query+group kernel at bench shapes (rel SA1).

Times the current per-scale calls vs a merged multi-scale call vs the
index-only kernel, isolating the per-slot selection cost. Run alone on the
real chip.
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
    s = jax.jit(lambda *a: fn(*a))
    for _ in range(warmup):
        float(jnp.asarray(jax.tree_util.tree_leaves(s(*args))[0]).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.asarray(jax.tree_util.tree_leaves(s(*args))[0]).astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:44s} {dt:9.2f} ms")
    return dt


def main():
    from or4d_tpu.ops.pallas_ball_query import (
        ball_query_group_pallas,
        ball_query_multiscale_pallas,
    )

    B, N, M, C = 640, 8000, 512, 64
    k0, k1, k2, k3 = jax.random.split(jax.random.key(0), 4)
    xyz = jax.random.normal(k0, (B, N, 3), jnp.float32) * 0.4
    q = xyz[:, :M, :]
    A1 = jax.random.normal(k2, (B, N, C), jnp.bfloat16)
    A2 = jax.random.normal(k3, (B, N, C), jnp.bfloat16)
    jax.block_until_ready((xyz, q, A1, A2))

    s1 = ((0.1, 16),)
    s2 = ((0.2, 32),)
    both = ((0.1, 16), (0.2, 32))

    t1 = timeit(lambda x, nq, a: ball_query_group_pallas(s1, x, nq, (a,)), xyz, q, A1,
                tag="fused group scale1 (r=.1, ns=16)")
    t2 = timeit(lambda x, nq, a: ball_query_group_pallas(s2, x, nq, (a,)), xyz, q, A2,
                tag="fused group scale2 (r=.2, ns=32)")
    tm = timeit(lambda x, nq, a, b: ball_query_group_pallas(both, x, nq, (a, b)), xyz, q, A1, A2,
                tag="fused group merged (both scales)")
    ti = timeit(lambda x, nq: ball_query_multiscale_pallas(both, x, nq), xyz, q,
                tag="index-only merged (no value matmuls)")
    print(f"per-scale total {t1 + t2:.2f} ms vs merged {tm:.2f} ms; selection ~= {tm - ti:.2f} ms")


if __name__ == "__main__":
    main()
