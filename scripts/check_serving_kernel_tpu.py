"""On-chip gate for the fused serving-SA1 kernel (ops/pallas_serving_mlp.py).

Parity first, at one set of shapes (--scenes, default 16):
  * serving (channel-major cache + fused kernel) vs COLD eval on the SAME
    unpaired batch/pack — the headline equality: both paths compute the SA1
    chain with f32 accumulation + bf16 A rounds (the kernel mirrors the v4
    raw eval kernel's arithmetic), so logits should be bit-equal or within
    float-zero noise;
  * serving kernel vs the XLA from_grouped path (row-major cache) — the
    round-4 serving formulation; bf16-rounding-level differences expected
    (the XLA chain rounds h to bf16 between ops, the kernel keeps f32).

Then timing: full serving forward + SA1-serving stage, kernel vs XLA.

Single-process only (CLAUDE.md timing rules); scalar host pulls force
execution.
"""

import argparse
import os
import sys
import time
from pathlib import Path

os.chdir(Path(__file__).resolve().parent.parent)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--skip-rm", action="store_true",
                    help="skip the XLA row-major comparison/timing (saves two compiles)")
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
        print(f"{label}: {ms:.1f} ms (iters {sorted(round(t * 1e3, 1) for t in ts)})", flush=True)
        return ms

    build_cm = jax.jit(lambda b, p: build_sgpn_sa1_caches(model, b, p, channel_major=True))
    caches_cm = build_cm(batch, pack)
    _ = float(caches_cm[1].new_xyz.sum())
    print("cm cache built", flush=True)

    fwd = jax.jit(
        lambda v, b, p, c: model.apply(v, b, train=False, pack=p, sa1_caches=c).rel_logprobs
    )
    cold_fwd = jax.jit(lambda v, b, p: model.apply(v, b, train=False, pack=p).rel_logprobs)

    out_cm = np.asarray(fwd(variables, batch, pack, caches_cm), np.float32)
    print("serving-kernel forward ran", flush=True)
    out_cold = np.asarray(cold_fwd(variables, batch, pack), np.float32)
    d_cold = np.abs(out_cm - out_cold)
    print(f"serving-kernel vs COLD: max|diff| {d_cold.max():.3e}  "
          f"bit-equal {(d_cold == 0).mean() * 100:.2f}%", flush=True)

    if not args.skip_rm:
        build_rm = jax.jit(lambda b, p: build_sgpn_sa1_caches(model, b, p, channel_major=False))
        caches_rm = build_rm(batch, pack)
        _ = float(caches_rm[1].new_xyz.sum())
        out_rm = np.asarray(fwd(variables, batch, pack, caches_rm), np.float32)
        d_rm = np.abs(out_cm - out_rm)
        print(f"serving-kernel vs XLA from_grouped: max|diff| {d_rm.max():.3e}", flush=True)

    # timing: full serving forward, kernel vs XLA
    run_cm = jax.jit(
        lambda v, b, p, c: model.apply(v, b, train=False, pack=p, sa1_caches=c).rel_logprobs.sum()
    )
    ms = timed("serving full fwd (fused kernel)", lambda: float(run_cm(variables, batch, pack, caches_cm)), args.iters)
    print(f"=> {S / (ms / 1e3):.1f} scenes/sec serving (kernel)", flush=True)
    if not args.skip_rm:
        ms_rm = timed("serving full fwd (XLA from_grouped)", lambda: float(run_cm(variables, batch, pack, caches_rm)), args.iters)
        print(f"=> {S / (ms_rm / 1e3):.1f} scenes/sec serving (XLA)", flush=True)


if __name__ == "__main__":
    main()
