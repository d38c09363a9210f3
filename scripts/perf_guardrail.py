"""On-chip perf guardrail: the fused SA1-rel stage must stay under budget.

Run alone on the chip BEFORE capturing a BENCH number; a regression here
means kernel tuning broke the hot path. Budgets live in BUDGETS (ms, with a
10% grace over the recorded best) — update them ONLY alongside a PERF.md
entry explaining the change.

Exit code 0 = within budget; 1 = regression.
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

# recorded bests (ms at 640 rows x 512 queries x 8000 pts, both SA1 scales)
# + 10% grace; see PERF.md round-4 table. None = record only (no recorded
# best yet — tighten alongside a PERF.md entry once measured).
BUDGETS = {
    # 2026-08-19 measured best 62.41 (round-5 runs; 64.79 on the clean
    # re-run) + 10% grace. The one 110.85 reading (measure_r5i) came
    # immediately after a train bench — a dirty-chip artifact, not a
    # regression: re-measured 64.79 solo. Run this script ALONE on the
    # chip (see the module docstring) or the first row reads high.
    "fps_with_counts": 69.0,
    # 2026-08-18 on-chip re-record (PERF.md driver-round-4 table): 190.9 ms
    # measured — the old 165 budget was aspirational, never a measured best
    # (round-4 PERF table had 188.1 at these shapes).
    "sa1_rel_v4": 210.0,
    # paired kernel: 320 pair rows with [A_fwd|A_rev] 128-lane planes and
    # blockdiag W1 — the direction-pair-sharing eval path (PERF.md round-5).
    # 2026-08-18 measured 104.4 ms.
    "sa1_rel_v4_paired": 115.0,
    # paired kernel in v4 raw mode (the bench DEFAULT since 2026-08-19): the
    # kernel takes the paired layer-1 weight + one channel-major raw plane
    # and materializes A in VMEM (PERF.md round-7). 2026-08-19 measured
    # 97.8 ms (round-5 guardrail run) + 10% grace.
    "sa1_rel_v4_paired_raw": 108.0,
    # serving fast path: the fused channel-major SA1 chain kernel
    # (ops/pallas_serving_mlp.py) over both SA1 scales at 640 rows — the
    # stage that makes serving 367.5 scenes/s (PERF.md round-8).
    # 2026-08-19 measured 33.96 ms + 10% grace.
    "serving_sa1_mlp": 37.5,
}


def timeit(fn, *args, iters=6, warmup=2):
    s = jax.jit(lambda *a: fn(*a))
    for _ in range(warmup):
        float(jnp.asarray(jax.tree_util.tree_leaves(s(*args))[0]).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.asarray(jax.tree_util.tree_leaves(s(*args))[0]).astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> int:
    from or4d_tpu.config import DatasetConfig
    from or4d_tpu.data.synthetic import make_scene_batch
    from or4d_tpu.ops.pallas_ball_query import _counts_to_bounds, ball_query_group_mlp_pallas_v4
    from or4d_tpu.ops.pallas_fps import furthest_point_sample_with_counts

    rows = 640
    ds = DatasetConfig()
    batch = make_scene_batch(num_scenes=6, seed=0, n_objects=9, ds=ds, points_per_obj=2000)
    rel = np.asarray(batch.rel_points)
    mask = np.asarray(batch.edge_mask).astype(bool)
    clouds = rel[mask][:, :, :3].astype(np.float32)
    clouds = np.concatenate([clouds] * (-(-rows // len(clouds))))[:rows]
    xyz = jax.device_put(jnp.asarray(clouds))
    scales = ((0.1, 16), (0.2, 32))

    t_fps = timeit(
        lambda x: sum(c.sum() for c in furthest_point_sample_with_counts(x, 512, (0.1, 0.2))[1]), xyz
    )

    idx, counts = furthest_point_sample_with_counts(xyz, 512, (0.1, 0.2))
    q = jnp.take_along_axis(xyz, idx[..., None], axis=1)
    bounds = _counts_to_bounds(scales, tuple(counts))
    rng = np.random.default_rng(0)
    params = []
    for c1, c2 in ((64, 64), (64, 128)):
        A = jax.device_put(jnp.asarray(rng.standard_normal((rows, 8000, c1)).astype(np.float32)).astype(jnp.bfloat16))
        Bq = jax.device_put(jnp.asarray(rng.standard_normal((rows, 512, c1)).astype(np.float32)))
        vecs = [jnp.asarray(rng.standard_normal((c,)).astype(np.float32)) for c in (c1, c1, c2, c2)]
        W1 = jnp.asarray(rng.standard_normal((c1, c2)).astype(np.float32)).astype(jnp.bfloat16)
        params.append((A, Bq, vecs[0], vecs[1], W1, vecs[2], vecs[3]))
    params = tuple(params)
    jax.block_until_ready(params)
    t_sa1 = timeit(
        lambda x, nq, p, b: ball_query_group_mlp_pallas_v4(scales, x, nq, p, b, False, None, 32, True),
        xyz, q, params, bounds,
    )

    # paired stage: half the rows, doubled feature planes / tiled affines /
    # blockdiag W1 — exactly what the paired SA1 path feeds the v4 kernel
    prows = rows // 2
    pxyz = xyz[:prows]
    pidx, pcounts = furthest_point_sample_with_counts(pxyz, 512, (0.1, 0.2))
    pq = jnp.take_along_axis(pxyz, pidx[..., None], axis=1)
    pbounds = _counts_to_bounds(scales, tuple(pcounts))
    pparams = []
    for A, Bq, a0, b0, W1, a1, b1 in params:
        c1, c2 = W1.shape
        W1b = jnp.zeros((2 * c1, 2 * c2), W1.dtype).at[:c1, :c2].set(W1).at[c1:, c2:].set(W1)
        pparams.append((
            jnp.concatenate([A[:prows], A[:prows]], axis=-1),
            jnp.concatenate([Bq[:prows], Bq[:prows]], axis=-1),
            jnp.concatenate([a0, a0]), jnp.concatenate([b0, b0]),
            W1b,
            jnp.concatenate([a1, a1]), jnp.concatenate([b1, b1]),
        ))
    pparams = tuple(pparams)
    jax.block_until_ready(pparams)
    t_paired = timeit(
        lambda x, nq, p, b: ball_query_group_mlp_pallas_v4(scales, x, nq, p, b, False, None, 32, True),
        pxyz, pq, pparams, pbounds,
    )

    # raw-mode paired stage — what the model actually feeds the kernel on
    # the default bench path since 2026-08-19 (models/pointnet2.py paired
    # branch): C0=7 raw channels [xyz|rgb|m_fwd] + the pair's m_rev as an
    # 8th channel, W0 tiled per direction with the mask row routed to its
    # half, Bq duplicated across the pair.
    C0 = 7
    raw = jax.device_put(
        jnp.asarray(rng.standard_normal((prows, C0 + 1, 8000)).astype(np.float32)).astype(jnp.bfloat16)
    )
    rparams = []
    for A, Bq, a0, b0, W1, a1, b1 in params:
        c1, c2 = W1.shape
        W0 = jnp.asarray(rng.standard_normal((C0, c1)).astype(np.float32)).astype(jnp.bfloat16)
        z = jnp.zeros_like(W0[C0 - 1 : C0])
        W0p = jnp.concatenate([
            jnp.concatenate([W0[: C0 - 1], W0[: C0 - 1]], axis=1),
            jnp.concatenate([W0[C0 - 1 : C0], z], axis=1),
            jnp.concatenate([z, W0[C0 - 1 : C0]], axis=1),
        ], axis=0)
        W1b = jnp.zeros((2 * c1, 2 * c2), W1.dtype).at[:c1, :c2].set(W1).at[c1:, c2:].set(W1)
        rparams.append((
            W0p, jnp.concatenate([Bq[:prows], Bq[:prows]], axis=-1),
            jnp.concatenate([a0, a0]), jnp.concatenate([b0, b0]),
            W1b,
            jnp.concatenate([a1, a1]), jnp.concatenate([b1, b1]),
        ))
    rparams = tuple(rparams)
    jax.block_until_ready(rparams)
    t_praw = timeit(
        lambda x, nq, p, b, r: ball_query_group_mlp_pallas_v4(
            scales, x, nq, p, b, False, None, 32, True, r),
        pxyz, pq, rparams, pbounds, raw,
    )

    # serving kernel: unpaired 640 rows, channel-major cached planes
    # (rows, ns, C0p, 512) per scale — the serving bench's SA1 stage shapes
    from or4d_tpu.ops.pallas_serving_mlp import serving_sa1_mlp_pallas

    sparams = []
    for (r, ns), (A, Bq, a0, b0, W1, a1, b1) in zip(scales, params):
        c1, c2 = W1.shape
        g = jax.device_put(
            jnp.asarray(rng.standard_normal((rows, 8, ns * 512)).astype(np.float32))
            .at[:, C0:, :].set(0.0).astype(jnp.bfloat16)
        )
        W0 = jnp.asarray(rng.standard_normal((C0, c1)).astype(np.float32)).astype(jnp.bfloat16)
        sparams.append((g, Bq.astype(jnp.bfloat16), W0, a0, b0, W1, a1, b1))
    jax.block_until_ready(sparams)
    nss = tuple(ns for _, ns in scales)
    t_serv = timeit(
        lambda p0, p1: serving_sa1_mlp_pallas(*p0, nss[0]).sum()
        + serving_sa1_mlp_pallas(*p1, nss[1]).sum(),
        sparams[0], sparams[1],
    )

    results = {"fps_with_counts": t_fps, "sa1_rel_v4": t_sa1,
               "sa1_rel_v4_paired": t_paired, "sa1_rel_v4_paired_raw": t_praw,
               "serving_sa1_mlp": t_serv}
    ok = True
    for k, v in results.items():
        budget = BUDGETS[k]
        if budget is None:
            print(f"{k:24s} {v:8.2f} ms (no budget yet — record only)")
            continue
        status = "OK" if v <= budget else "REGRESSION"
        if v > budget:
            ok = False
        print(f"{k:24s} {v:8.2f} ms (budget {budget:.1f}) {status}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
