"""Isolated repro for the two TPU-worker-crashing knobs (VERDICT r4 ask 3):
`--eval-subtile 64` and `--per-scale-sort`, both on the paired eval path
(kernel fault 2026-08-18, measure_r4 logs; they poison ~4 min of subsequent
steps, so this script runs ONE case per invocation and exits).

Usage: python scripts/crash_repro.py <case>
  cases: sub64_paired sub64_plain sub64_paired_noraw   (eval_subtile=64)
         pss_scale0 pss_scale1                         (per-scale solo calls)
         baseline                                      (paired sub32 control)
Run LAST in any measurement sequence; expect a worker restart after a fault.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/or4d_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    case = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    from or4d_tpu.ops.pallas_ball_query import (
        _counts_to_bounds,
        ball_query_group_mlp_pallas_v4,
    )
    from or4d_tpu.ops.pallas_fps import furthest_point_sample_with_counts

    rows, N, M = 128, 8000, 512
    rng = np.random.default_rng(0)
    xyz = jax.device_put(jnp.asarray(
        (rng.standard_normal((rows, N, 3)) * 0.5).astype(np.float32)))
    scales = ((0.1, 16), (0.2, 32))
    idx, counts = furthest_point_sample_with_counts(xyz, M, (0.1, 0.2))
    q = jnp.take_along_axis(xyz, idx[..., None], axis=1)
    bounds = _counts_to_bounds(scales, tuple(counts))
    jax.block_until_ready((q, bounds))

    # the 2026-08-18 crashes were on the PAIRED bench path; single-scale
    # cases stay paired so the repro matches (sub64_plain is the unpaired
    # control)
    paired = case != "sub64_plain"
    raw_mode = case != "sub64_paired_noraw"
    subtile = 64 if case.startswith("sub64") else 32
    C0 = 8 if paired else 7  # [xyz|rgb|m_fwd|m_rev] vs [xyz|rgb|m]

    Np = N  # already a _CHUNK multiple
    raw = jax.device_put(jnp.asarray(
        rng.standard_normal((rows, C0, Np)).astype(np.float32)).astype(jnp.bfloat16))

    def make_params(c1, c2):
        mult = 2 if paired else 1
        if raw_mode:
            A = jnp.asarray(rng.standard_normal((C0, mult * c1)).astype(np.float32)).astype(jnp.bfloat16)
        else:
            A = jnp.asarray(rng.standard_normal((rows, Np, mult * c1)).astype(np.float32)).astype(jnp.bfloat16)
        Bq = jnp.asarray(rng.standard_normal((rows, M, mult * c1)).astype(np.float32))
        a0 = jnp.asarray(rng.standard_normal((mult * c1,)).astype(np.float32))
        b0 = jnp.asarray(rng.standard_normal((mult * c1,)).astype(np.float32))
        W1 = jnp.asarray(rng.standard_normal((mult * c1, mult * c2)).astype(np.float32)).astype(jnp.bfloat16)
        a1 = jnp.asarray(rng.standard_normal((mult * c2,)).astype(np.float32))
        b1 = jnp.asarray(rng.standard_normal((mult * c2,)).astype(np.float32))
        return (A, Bq, a0, b0, W1, a1, b1)

    params = (make_params(64, 64), make_params(64, 128))
    params = jax.device_put(params)
    raw_arg = raw if raw_mode else None

    def run(spec, prm, bnd):
        out = ball_query_group_mlp_pallas_v4(
            spec, xyz, q, prm, bnd, False, None, subtile, True, raw_arg)
        return sum(float(o.astype(jnp.float32).sum()) for o in out)

    t0 = time.perf_counter()
    if case.startswith("pss_scale0"):
        v = run((scales[0],), (params[0],), (bounds[0],))
    elif case.startswith("pss_scale1"):
        v = run((scales[1],), (params[1],), (bounds[1],))
    else:
        v = run(scales, params, bounds)
    print(f"{case}: OK value={v:.3e} elapsed={time.perf_counter() - t0:.1f}s", flush=True)
    # a second call to confirm steady-state (faults sometimes fire on rerun)
    t0 = time.perf_counter()
    if case.startswith("pss_scale0"):
        v = run((scales[0],), (params[0],), (bounds[0],))
    elif case.startswith("pss_scale1"):
        v = run((scales[1],), (params[1],), (bounds[1],))
    else:
        v = run(scales, params, bounds)
    print(f"{case}: OK2 value={v:.3e} elapsed={time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
