"""Per-stage timing of the SGPN pipeline at bench shapes (S=8).

All timings use scalar-reduce host pulls: the axon backend's
block_until_ready does not reliably block, and bulk host transfers ride a
slow tunnel.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def t(f, iters=3):
    float(f())
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f())
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from or4d_tpu import ops
    from or4d_tpu.ops.pallas_ball_query import ball_query_multiscale_pallas

    S = 8
    B = S * 132  # padded edge rows
    N, M = 8000, 512
    rng = np.random.default_rng(0)
    xyz = jnp.asarray((rng.standard_normal((B, N, 3)) * 0.5).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((B, N, 4)).astype(np.float32))

    fps = jax.jit(lambda x: ops.furthest_point_sample(x, M).sum())
    print(f"FPS (1056,8000)->512:            {t(lambda: fps(xyz)):9.1f} ms")
    idx = jax.jit(lambda x: ops.furthest_point_sample(x, M))(xyz)
    new_xyz = jnp.take_along_axis(xyz, idx[..., None], axis=1)

    bq = jax.jit(lambda a, b: sum(o.sum() for o in ball_query_multiscale_pallas(((0.1, 16), (0.2, 32)), a, b)))
    print(f"ball query dual (1056,512,8000): {t(lambda: bq(xyz, new_xyz)):9.1f} ms")
    qidx = jax.jit(lambda a, b: ball_query_multiscale_pallas(((0.1, 16), (0.2, 32)), a, b)[1])(xyz, new_xyz)

    gather = jax.jit(lambda f, q: jnp.take_along_axis(f[:, :, None, :], q[..., None], axis=1).sum())
    print(f"grouping gather (1056,512,32,4): {t(lambda: gather(feats, qidx)):9.1f} ms")

    w1 = jnp.asarray(rng.standard_normal((7, 64)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    grouped = jax.jit(lambda f, q: jnp.take_along_axis(f[:, :, None, :], q[..., None], axis=1))(feats, qidx)
    x7 = jnp.concatenate([grouped, jnp.zeros(grouped.shape[:-1] + (3,), grouped.dtype)], axis=-1)

    def mlp(x, dt):
        h = jnp.einsum("bmsc,cd->bmsd", x.astype(dt), w1.astype(dt), preferred_element_type=jnp.float32)
        h = jnp.maximum(h, 0).astype(dt)
        h = jnp.einsum("bmsc,cd->bmsd", h, w2.astype(dt), preferred_element_type=jnp.float32)
        return jnp.max(h, axis=2).sum()

    print(f"SA1-scale2 MLP f32:              {t(jax.jit(lambda: mlp(x7, jnp.float32))):9.1f} ms")
    print(f"SA1-scale2 MLP bf16:             {t(jax.jit(lambda: mlp(x7, jnp.bfloat16))):9.1f} ms")

    # SA2-scale shapes: (1056, 128, 96, 195) @ (195, 128)
    x2 = jnp.asarray(rng.standard_normal((B, 128, 96, 195)).astype(np.float32))
    w3 = jnp.asarray(rng.standard_normal((195, 128)).astype(np.float32))

    def mlp2(x, w, dt):
        h = jnp.einsum("bmsc,cd->bmsd", x.astype(dt), w.astype(dt), preferred_element_type=jnp.float32)
        return jnp.max(h, axis=2).sum()

    print(f"SA2 MLP matmul f32:              {t(jax.jit(lambda: mlp2(x2, w3, jnp.float32))):9.1f} ms")
    print(f"SA2 MLP matmul bf16:             {t(jax.jit(lambda: mlp2(x2, w3, jnp.bfloat16))):9.1f} ms")


if __name__ == "__main__":
    main()
