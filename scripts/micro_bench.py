"""Microbenchmarks attributing SGPN forward time to op families on TPU."""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from or4d_tpu import ops

    rng = np.random.default_rng(0)
    B, N, M = 132, 8000, 512
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32) * 0.5)
    feats = jnp.asarray(rng.standard_normal((B, 4, N)).astype(np.float32))

    # FPS
    t = timeit(jax.jit(partial(ops.furthest_point_sample, npoint=M)), xyz)
    print(f"FPS pallas  (132,8000)->512:      {t:8.2f} ms")

    idx = ops.furthest_point_sample(xyz, M)
    new_xyz = jnp.take_along_axis(xyz, idx[..., None], axis=1)

    # ball query alone
    t = timeit(jax.jit(partial(ops.ball_query, 0.2, 32)), xyz, new_xyz)
    print(f"ball_query r=.2 ns=32:            {t:8.2f} ms")

    # pairwise distance alone (what part of ball query is the matmul?)
    from or4d_tpu.ops.ball_query import pairwise_sqdist

    t = timeit(jax.jit(lambda a, b: pairwise_sqdist(a, b).sum()), new_xyz, xyz)
    print(f"pairwise d2 (+reduce):            {t:8.2f} ms")

    # top_k alone on random keys
    keys = jnp.asarray(rng.integers(-16000, 0, size=(B, M, N)).astype(np.int32))
    t = timeit(jax.jit(lambda k: jax.lax.top_k(k, 32)[0]), keys)
    print(f"top_k(32) over (132,512,8000):    {t:8.2f} ms")

    # grouping gather
    gidx = jnp.asarray(rng.integers(0, N, size=(B, M, 32)).astype(np.int32))
    t = timeit(jax.jit(ops.grouping_operation), feats, gidx)
    print(f"grouping gather (132,4,512,32):   {t:8.2f} ms")

    # MLP matmul f32 vs bf16: SA2-scale einsum (B, M, S, C) @ (C, C2)
    x = jnp.asarray(rng.standard_normal((B, 128, 96, 195)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((195, 128)).astype(np.float32))
    t = timeit(jax.jit(lambda x, w: jnp.einsum("bmsc,cd->bmsd", x, w)), x, w)
    print(f"SA2 MLP matmul f32:               {t:8.2f} ms")
    t = timeit(jax.jit(lambda x, w: jnp.einsum("bmsc,cd->bmsd", x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), preferred_element_type=jnp.float32)), x, w)
    print(f"SA2 MLP matmul bf16:              {t:8.2f} ms")


if __name__ == "__main__":
    main()
