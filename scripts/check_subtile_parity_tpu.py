"""On-chip parity check: the sub-tile-gated eval kernel must match the
static kernel bit-for-bit on real bench geometry (the CPU interpret tests
prove the algorithm; this catches TPU-side compile/lowering surprises)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/or4d_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from or4d_tpu import ops
    from or4d_tpu.config import DatasetConfig
    from or4d_tpu.data.synthetic import make_scene_batch
    from or4d_tpu.ops.pallas_ball_query import ball_query_group_mlp_pallas

    rows = 64
    ds = DatasetConfig()
    batch = make_scene_batch(num_scenes=1, seed=3, n_objects=9, ds=ds, points_per_obj=2000)
    rel = np.asarray(batch.rel_points)
    mask = np.asarray(batch.edge_mask).astype(bool)
    clouds = rel[mask][:rows, :, :3].astype(np.float32)
    xyz = jax.device_put(jnp.asarray(clouds))
    qidx = ops.furthest_point_sample(xyz, 512)
    q = jnp.take_along_axis(xyz, qidx[..., None], axis=1)

    scales = ((0.1, 16), (0.2, 32))
    rng = np.random.default_rng(0)
    params = []
    for c1, c2 in ((64, 64), (64, 128)):
        A = jax.device_put(jnp.asarray(rng.standard_normal((len(clouds), 8000, c1)).astype(np.float32)).astype(jnp.bfloat16))
        Bq = jax.device_put(jnp.asarray(rng.standard_normal((len(clouds), 512, c1)).astype(np.float32)))
        vecs = [jnp.asarray(rng.standard_normal((c,)).astype(np.float32)) for c in (c1, c1)]
        W1 = jnp.asarray(rng.standard_normal((c1, c2)).astype(np.float32)).astype(jnp.bfloat16)
        vecs2 = [jnp.asarray(rng.standard_normal((c,)).astype(np.float32)) for c in (c2, c2)]
        params.append((A, Bq, vecs[0], vecs[1], W1, vecs2[0], vecs2[1]))
    params = tuple(params)

    static = jax.jit(lambda x, nq, p: ball_query_group_mlp_pallas(scales, x, nq, p))
    gated = jax.jit(lambda x, nq, p: ball_query_group_mlp_pallas(scales, x, nq, p, False, None, False, 32))
    a = static(xyz, q, params)
    b = gated(xyz, q, params)
    ok = True
    for s, (o1, o2) in enumerate(zip(a, b)):
        d = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
        print(f"scale {s}: max|static - subtile| = {d:.3e}")
        ok &= d == 0.0
    print("PARITY", "OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
