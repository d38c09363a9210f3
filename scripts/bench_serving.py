"""Serving-path stage attribution on the real chip.

Times, at bench shapes (S scenes, paper crop sizes):
  1. one-time SA1 geometry cache build (amortized away in serving),
  2. steady-state serving forward (the sg_serving_scenes_per_sec number),
  3. SA1-serving alone (encoders stubbed after SA1) vs the full model,
so the post-SA1 tail (SA2/SA3/GCN/heads) is attributed directly.

Single-process only (CLAUDE.md timing rules); scalar host pulls force
execution.
"""

import argparse
import os
import sys
import time
from pathlib import Path

os.chdir(Path(__file__).resolve().parent.parent)  # axon plugin needs cwd=/root/repo
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/or4d_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from or4d_tpu.config import DatasetConfig
    from or4d_tpu.data.scene_batch import SlotPack
    from or4d_tpu.data.synthetic import make_scene_batch
    from or4d_tpu.models import SGPN
    from or4d_tpu.serving import build_sgpn_sa1_caches

    S = args.scenes
    batch = make_scene_batch(num_scenes=S, seed=0, n_objects=9, ds=DatasetConfig(), points_per_obj=2000)
    model = SGPN(num_classes=12, num_relations=15, compute_dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, b, train=False)
    )(batch)
    pack = SlotPack.build(batch)
    batch = jax.device_put(batch)
    pack = jax.device_put(pack)

    def timed(label, fn, iters):
        fn()  # compile + warm
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3
        print(f"{label}: {ms:.1f} ms (iters {sorted(round(t * 1e3, 1) for t in ts)})")
        return ms

    build = jax.jit(lambda b, p: build_sgpn_sa1_caches(model, b, p))
    t0 = time.perf_counter()
    caches = build(batch, pack)
    # force: scalar-pull one leaf per cache
    _ = float(caches[0].new_xyz.sum()) + float(caches[1].new_xyz.sum())
    print(f"cache build (compile+run, one-time): {(time.perf_counter() - t0):.1f} s")
    timed("cache build steady-state", lambda: float(build(batch, pack)[1].new_xyz.sum()), 3)
    total_bytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(caches))
    print(f"cache size: {total_bytes / 1e9:.2f} GB")

    fwd = jax.jit(lambda v, b, p, c: model.apply(v, b, train=False, pack=p, sa1_caches=c).rel_logprobs.sum())
    full_ms = timed("serving full fwd", lambda: float(fwd(variables, batch, pack, caches)), args.iters)
    print(f"=> {S / (full_ms / 1e3):.1f} scenes/sec serving")

    # SA1-serving alone: sum the SA1 stage outputs of both encoders through
    # the cached path (everything after SA1 skipped)
    from or4d_tpu.models.pointnet2 import SA1_RADII, SAScale, SetAbstractionMSG

    def sa1_only(v, c):
        total = jnp.zeros((), jnp.float32)
        for enc, cache, nss in (("obj_encoder", c[0], model.sa_nsamples[0]),
                                ("rel_encoder", c[1], model.sa_nsamples[0])):
            sa1 = SetAbstractionMSG(
                npoint=model.sa_npoints[0],
                scales=(SAScale(SA1_RADII[0], nss[0], (64, 64)), SAScale(SA1_RADII[1], nss[1], (64, 128))),
                dtype=jnp.bfloat16,
            )
            params = {"params": v["params"][enc]["sa1"],
                      "batch_stats": v["batch_stats"][enc]["sa1"]}
            _, f = sa1.apply(params, None, None, train=False, cache=cache)
            total = total + f.astype(jnp.float32).sum()
        return total

    sa1_fn = jax.jit(sa1_only)
    sa1_ms = timed("SA1-serving alone (obj+rel)", lambda: float(sa1_fn(variables, caches)), args.iters)
    print(f"post-SA1 tail (SA2/SA3/GCN/heads/scatter): ~{full_ms - sa1_ms:.1f} ms")


if __name__ == "__main__":
    main()
