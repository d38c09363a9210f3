"""Measure the SA1 stage's component costs at S=8 bench shapes (scalar-pull
sync). Run with JAX_COMPILATION_CACHE_DIR set."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def t(f, *a, iters=3):
    float(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(*a))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from or4d_tpu.ops.pallas_ball_query import ball_query_multiscale_pallas

    rng = np.random.default_rng(0)
    B, N, M, S = 1056, 8000, 512, 32
    xyz = jnp.asarray((rng.standard_normal((B, N, 3)) * 0.5).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((B, N, 7)).astype(np.float32))
    qidx = jnp.asarray(rng.integers(0, N, size=(B, M, S)).astype(np.int32))
    new_xyz = xyz[:, :M, :]

    bq = jax.jit(lambda a, b: sum(o.sum() for o in ball_query_multiscale_pallas(((0.1, 16), (0.2, 32)), a, b)))
    print(f"ballq dual S=8 (1056):            {t(bq, xyz, new_xyz):9.1f} ms", flush=True)

    g1 = jax.jit(lambda f, q: jnp.take_along_axis(f[:, :, None, :], q[..., None], axis=1).sum())
    print(f"gather channel-last (B,M,S,7):    {t(g1, feats, qidx):9.1f} ms", flush=True)

    fcf = jnp.swapaxes(feats, 1, 2)
    g2 = jax.jit(lambda f, q: jnp.take_along_axis(f, q.reshape(B, 1, M * S), axis=2).sum())
    print(f"gather channel-first (B,7,M*S):   {t(g2, fcf, qidx):9.1f} ms", flush=True)

    f2 = jnp.asarray(rng.standard_normal((B, 512, 195)).astype(np.float32))
    q2 = jnp.asarray(rng.integers(0, 512, size=(B, 128, 96)).astype(np.int32))
    g4 = jax.jit(lambda f, q: jnp.take_along_axis(f[:, :, None, :], q[..., None], axis=1).sum())
    print(f"gather SA2 (1056,128,96,195):     {t(g4, f2, q2):9.1f} ms", flush=True)

    # SA1 MLP at real shape, bf16
    grouped = jnp.asarray(rng.standard_normal((B, M, S, 10)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((10, 64)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))

    def mlp(x, wa, wb):
        dt = jnp.bfloat16
        h = jnp.einsum("bmsc,cd->bmsd", x.astype(dt), wa.astype(dt), preferred_element_type=jnp.float32)
        h = jnp.maximum(h, 0).astype(dt)
        h = jnp.einsum("bmsc,cd->bmsd", h, wb.astype(dt), preferred_element_type=jnp.float32)
        return jnp.max(h, axis=2).sum()

    print(f"SA1-sc2 MLP bf16 (B,512,32,10):   {t(jax.jit(mlp), grouped, w1, w2):9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
