"""Measure this environment's per-dispatch tunnel overhead.

Every synchronous jit-call + scalar pull on the axon backend rides the
device tunnel for a full round trip; this script measures that floor with a
trivial kernel, then shows how JAX async dispatch amortizes it when k calls
are queued before one sync (the bench.py default "pipelined" timing mode).

Measured 2026-08-19 (v5e behind the tunnel):

    sync floor:   28.5-35.3 ms per call   (trivial (8,128) multiply+sum)
    k=4 queued:   7.9 ms per call
    k=16 queued:  2.4 ms per call

i.e. ~32 ms of every synchronous per-batch timing is tunnel RTT, not model
time. Stage timings below ~5 ms are unmeasurable with per-call sync — use
k-queued timing for small kernels (scripts/perf_guardrail.py documents the
floor for its absolute budgets).
"""

import time

import jax
import jax.numpy as jnp


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/or4d_jax_cache_tpu")
    f = jax.jit(lambda x: (x * 2.0).sum())
    x = jax.device_put(jnp.ones((8, 128)))
    float(f(x))  # compile + warm

    ts = []
    for _ in range(16):
        t0 = time.perf_counter()
        float(f(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    print("sync dispatch floor ms:", sorted(round(t, 2) for t in ts))

    for k in (1, 4, 16):
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            r = None
            for _ in range(k):
                r = f(x)
            float(r)
            ts.append((time.perf_counter() - t0) * 1e3)
        ts.sort()
        med = ts[len(ts) // 2]
        print(f"k={k:3d} queued: total {med:7.2f} ms -> per-call {med / k:7.2f} ms")


if __name__ == "__main__":
    main()
