"""Chunk sweep for the slot-flattened serving SA1 kernel (v3 layout).

Times serving_sa1_mlp_pallas at the guardrail's serving-stage shapes
(640 rows x 512 queries, both SA1 scales) for several slots-per-MXU-chunk
values. chunk=1 reproduces v2's per-slot dot structure on the v3 layout
(the v2 kernel proper measured 33.96 ms total on 2026-08-19).

Single-process only (CLAUDE.md timing rules).
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
    ap.add_argument("--chunks", type=int, nargs="+", default=[4])
    ap.add_argument("--rows-per-program", type=int, nargs="+", default=[1, 4, 8])
    ap.add_argument("--rows", type=int, default=640)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/or4d_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from or4d_tpu.ops.pallas_serving_mlp import serving_sa1_mlp_pallas

    rows, C0, M = args.rows, 7, 512
    scales = ((16, 64, 64), (32, 64, 128))  # (ns, C1, C2)
    rng = np.random.default_rng(0)
    sparams = []
    for ns, c1, c2 in scales:
        g = jax.device_put(
            jnp.asarray(rng.standard_normal((rows, 8, ns * M)).astype(np.float32))
            .at[:, C0:, :].set(0.0).astype(jnp.bfloat16)
        )
        Bq = jax.device_put(jnp.asarray(rng.standard_normal((rows, M, c1)).astype(np.float32)).astype(jnp.bfloat16))
        W0 = jnp.asarray(rng.standard_normal((C0, c1)).astype(np.float32)).astype(jnp.bfloat16)
        a0, b0 = (jnp.asarray(rng.standard_normal((c,)).astype(np.float32)) for c in (c1, c1))
        W1 = jnp.asarray(rng.standard_normal((c1, c2)).astype(np.float32)).astype(jnp.bfloat16)
        a1, b1 = (jnp.asarray(rng.standard_normal((c,)).astype(np.float32)) for c in (c2, c2))
        sparams.append((g, Bq, W0, a0, b0, W1, a1, b1, ns))
    jax.block_until_ready([p[0] for p in sparams])

    ns0, ns1 = sparams[0][-1], sparams[1][-1]
    args0, args1 = sparams[0][:-1], sparams[1][:-1]
    for chunk in args.chunks:
        for rb in args.rows_per_program:
            c0, c1 = min(chunk, ns0), min(chunk, ns1)
            fn = jax.jit(
                lambda p0, p1, c0=c0, c1=c1, rb=rb:
                serving_sa1_mlp_pallas(*p0, ns0, False, c0, rb).sum()
                + serving_sa1_mlp_pallas(*p1, ns1, False, c1, rb).sum()
            )
            float(fn(args0, args1))  # compile + warm
            ts = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                float(fn(args0, args1))
                ts.append(time.perf_counter() - t0)
            print(f"chunk {chunk:3d} rb {rb:2d}: {float(np.median(ts)) * 1e3:7.2f} ms "
                  f"(iters {sorted(round(t * 1e3, 1) for t in ts)})", flush=True)


if __name__ == "__main__":
    main()
