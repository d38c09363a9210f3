"""Bisect the full-model cost: stop after encoders / after GCN / full."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from or4d_tpu.config import DatasetConfig
from or4d_tpu.data.synthetic import make_scene_batch
from or4d_tpu.models import SGPN


def t(f, *a, iters=3):
    float(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(*a))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    S = 8
    batch = make_scene_batch(num_scenes=S, seed=0, n_objects=9, ds=DatasetConfig(), points_per_obj=2000)
    model = SGPN(num_classes=12, num_relations=15, compute_dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, b, train=False)
    )(batch)

    enc_only = jax.jit(lambda v, b: model.apply(v, b, train=False).rel_features.sum())
    print(f"up to rel_features:   {t(enc_only, variables, batch):9.1f} ms", flush=True)

    both_enc = jax.jit(
        lambda v, b: (lambda o: o.rel_features.sum() + o.obj_features.sum())(model.apply(v, b, train=False))
    )
    print(f"both encoders:        {t(both_enc, variables, batch):9.1f} ms", flush=True)

    gcn_out = jax.jit(lambda v, b: model.apply(v, b, train=False).gcn_rel_features.sum())
    print(f"up to gcn:            {t(gcn_out, variables, batch):9.1f} ms", flush=True)

    full = jax.jit(lambda v, b: model.apply(v, b, train=False).rel_logprobs.sum())
    print(f"full (rel_logprobs):  {t(full, variables, batch):9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
