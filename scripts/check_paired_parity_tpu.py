"""On-chip check: paired rel-encoder eval path vs the unpaired path.

Builds a pair-shared batch at bench shapes, runs the SGPN eval forward with
(a) the plain edge pack and (b) the paired pack, asserts the rel logprobs
match on valid edges, and times both with scalar host pulls.

Run: cd /root/repo && python scripts/check_paired_parity_tpu.py [--scenes 8]
"""

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

os.chdir(Path(__file__).resolve().parent.parent)  # axon plugin needs cwd=/root/repo
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/or4d_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from or4d_tpu.config import DatasetConfig
    from or4d_tpu.data.scene_batch import SlotPack
    from or4d_tpu.data.synthetic import make_scene_batch
    from or4d_tpu.models import SGPN

    S = args.scenes
    ds = DatasetConfig()
    batch = make_scene_batch(num_scenes=S, seed=0, n_objects=9, ds=ds,
                             points_per_obj=2000, pair_shared=True)
    model = SGPN(num_classes=12, num_relations=15, compute_dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, b, train=False)
    )(batch)

    pack_plain = jax.device_put(SlotPack.build(batch))
    pack_paired = jax.device_put(SlotPack.build(batch, paired=True))
    em = np.asarray(batch.edge_mask)
    batch = jax.device_put(batch)

    fwd = jax.jit(lambda v, b, p: model.apply(v, b, train=False, pack=p).rel_logprobs)
    probe = jax.jit(lambda v, b, p: model.apply(v, b, train=False, pack=p).rel_logprobs.sum())

    t0 = time.time()
    print(f"[{time.time()-t0:7.1f}s] compiling plain ...", flush=True)
    rel_plain = np.asarray(jax.device_get(fwd(variables, batch, pack_plain)))
    print(f"[{time.time()-t0:7.1f}s] plain done; compiling paired ...", flush=True)
    rel_paired = np.asarray(jax.device_get(fwd(variables, batch, pack_paired)))
    print(f"[{time.time()-t0:7.1f}s] paired done", flush=True)

    d = np.abs(rel_plain[em] - rel_paired[em])
    denom = np.maximum(np.abs(rel_plain[em]), 1e-6)
    print(f"valid edges: {em.sum()}  max abs diff {d.max():.3e}  max rel {np.max(d/denom):.3e}")
    assert d.max() < 5e-2 and np.median(d) < 1e-3, "paired path diverges from plain path"

    for name, pk in (("plain", pack_plain), ("paired", pack_paired)):
        float(probe(variables, batch, pk))  # compile + warm
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(probe(variables, batch, pk))
            times.append(time.perf_counter() - t0)
        ms = float(np.median(times)) * 1e3
        print(f"{name:>6}: {ms:7.1f} ms/batch  {S/np.median(times):6.2f} scenes/s  "
              f"(per-iter {[round(t*1e3,1) for t in times]})")


if __name__ == "__main__":
    main()
