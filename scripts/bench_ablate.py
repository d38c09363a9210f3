"""Ablation bench: time SGPN variants to attribute the remaining cost."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from or4d_tpu.config import DatasetConfig
from or4d_tpu.data.synthetic import make_scene_batch
from or4d_tpu.models import SGPN
from or4d_tpu.models.pointnet2 import PointNet2MSGEncoder


def t(f, *a, iters=3):
    float(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(*a))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    S = 8
    ds = DatasetConfig()
    batch = make_scene_batch(num_scenes=S, seed=0, n_objects=9, ds=ds, points_per_obj=2000)
    dt = jnp.bfloat16

    # full model
    model = SGPN(num_classes=12, num_relations=15, compute_dtype=dt)
    variables = jax.jit(lambda b: model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, b, train=False))(batch)
    full = jax.jit(lambda v, b: model.apply(v, b, train=False).rel_logprobs.sum())
    print(f"full model:            {t(full, variables, batch):9.1f} ms", flush=True)

    # rel encoder alone (1056 x 8000 x 7)
    rel_flat = jnp.asarray(np.asarray(batch.rel_points).reshape(-1, 8000, 7))
    enc = PointNet2MSGEncoder(input_dim=7, out_size=256, dtype=dt)
    ev = jax.jit(lambda x: enc.init({"params": jax.random.key(0)}, x, train=False))(rel_flat[:8])
    rel_fn = jax.jit(lambda v, x: enc.apply(v, x, train=False).sum())
    print(f"rel encoder (1056):    {t(rel_fn, ev, rel_flat):9.1f} ms", flush=True)

    # obj encoder alone (96 x 4000 x 6)
    obj_flat = jnp.asarray(np.asarray(batch.obj_points).reshape(-1, 4000, 6))
    enc6 = PointNet2MSGEncoder(input_dim=6, out_size=256, dtype=dt)
    ev6 = jax.jit(lambda x: enc6.init({"params": jax.random.key(0)}, x, train=False))(obj_flat[:8])
    obj_fn = jax.jit(lambda v, x: enc6.apply(v, x, train=False).sum())
    print(f"obj encoder (96):      {t(obj_fn, ev6, obj_flat):9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
