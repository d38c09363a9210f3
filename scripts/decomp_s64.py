"""Cold-path stage decomposition at the S=64 bench default (VERDICT r4 ask 2).

Times the real model legs at the exact shapes the headline bench runs
(paired + v4 raw mode), by applying the encoder modules standalone on the
packed crops the bench batch produces:

  full        the headline forward (should reproduce ~BENCH_LATEST batch_ms)
  rel-leg     paired rel encoder (SA1 paired-raw kernel + SA2/SA3 per dir)
  rel-SA1     the paired SA1 stage alone (FPS+counts + v4 paired raw kernel)
  rel-FPS     FPS+counts alone at the rel rows
  obj-leg     obj encoder (SA1 raw kernel + SA2/SA3)
  tail        full - rel-leg - obj-leg (pack gathers/scatters + GCN + heads)

Scalar-pull sync everywhere (CLAUDE.md); run ALONE on the chip.
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


def timeit(fn, *args, iters=6, warmup=1, tag=""):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:44s} {dt:9.1f} ms", flush=True)
    return dt


def main():
    from or4d_tpu.config import DatasetConfig
    from or4d_tpu.data.scene_batch import SlotPack
    from or4d_tpu.data.synthetic import make_scene_batch
    from or4d_tpu.models import SGPN
    from or4d_tpu.models.pointnet2 import PointNet2MSGEncoder

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ds = DatasetConfig()
    batch = make_scene_batch(num_scenes=S, seed=0, n_objects=9, ds=ds,
                             points_per_obj=2000, pair_shared=True)
    model = SGPN(num_classes=12, num_relations=15, compute_dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, b, train=False)
    )(batch)
    pack = SlotPack.build(batch, paired=True)
    batch = jax.device_put(batch)
    pack = jax.device_put(pack)

    # ---- full headline forward
    fwd = jax.jit(lambda v, b, p: model.apply(v, b, train=False, pack=p).rel_logprobs.sum())
    t_full = timeit(fwd, variables, batch, pack, tag=f"full paired fwd S={S}")

    # ---- packed crops exactly as SGPN builds them (sgpn.py:140-174)
    Sb, O, Po, Co = batch.obj_points.shape
    _, E, Pr, Cr = batch.rel_points.shape
    obj_flat = jnp.take(batch.obj_points.reshape(Sb * O, Po, Co).astype(jnp.float32),
                        pack.obj_idx, axis=0)
    obj_mask = pack.obj_valid.astype(jnp.float32)
    rel_flat = jnp.take(batch.rel_points.reshape(Sb * E, Pr, Cr).astype(jnp.float32),
                        pack.pair_idx, axis=0)
    m = rel_flat[..., 6:7]
    rel_flat = jnp.concatenate(
        [rel_flat[..., :6], m, jnp.where(m > 0, 3.0 - m, 0.0)], axis=-1)
    rel_mask = pack.pair_valid.astype(jnp.float32)
    obj_flat, rel_flat = jax.device_put((obj_flat, rel_flat))
    print(f"rows: obj {obj_flat.shape[0]} x {Po}pts, rel pairs {rel_flat.shape[0]} x {Pr}pts",
          flush=True)

    # ---- encoder legs, standalone modules at the same shapes/knobs
    enc_kw = dict(out_size=256, dtype=jnp.bfloat16)
    rel_enc = PointNet2MSGEncoder(input_dim=Cr, **enc_kw)
    rv = jax.jit(lambda x, m: rel_enc.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, mask=m,
        train=False, paired=True))(rel_flat, rel_mask)
    rel_fn = jax.jit(lambda v, x, m: rel_enc.apply(v, x, mask=m, train=False, paired=True).sum())
    t_rel = timeit(rel_fn, rv, rel_flat, rel_mask, tag="rel-leg (paired SA1+SA2+SA3)")

    obj_enc = PointNet2MSGEncoder(input_dim=Co, **enc_kw)
    ov = jax.jit(lambda x, m: obj_enc.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, mask=m,
        train=False))(obj_flat, obj_mask)
    obj_fn = jax.jit(lambda v, x, m: obj_enc.apply(v, x, mask=m, train=False).sum())
    t_obj = timeit(obj_fn, ov, obj_flat, obj_mask, tag="obj-leg (SA1+SA2+SA3)")

    # ---- rel SA1 alone (paired raw v4 kernel incl. FPS+counts + prep)
    from or4d_tpu.models.pointnet2 import SA1_RADII, SAScale, SetAbstractionMSG

    sa1 = SetAbstractionMSG(
        npoint=512,
        scales=(SAScale(SA1_RADII[0], 16, (64, 64)), SAScale(SA1_RADII[1], 32, (64, 128))),
        dtype=jnp.bfloat16, fused_mode="eval_kernel",
    )
    xyz = rel_flat[..., 0:3].astype(jnp.float32)
    f_fwd = rel_flat[..., 3:7]
    f_rev = jnp.concatenate([rel_flat[..., 3:6], rel_flat[..., 7:8]], axis=-1)
    sv = jax.jit(lambda x, a, b, m: sa1.init(
        {"params": jax.random.key(0)}, x, a, mask=m, train=False, features_alt=b))(
        xyz, f_fwd, f_rev, rel_mask)
    sa1_fn = jax.jit(lambda v, x, a, b, m: sa1.apply(
        v, x, a, mask=m, train=False, features_alt=b)[1].sum())
    t_sa1 = timeit(sa1_fn, sv, xyz, f_fwd, f_rev, rel_mask, tag="rel-SA1 (FPS + v4 paired raw)")

    # ---- FPS+counts alone at the rel rows
    from or4d_tpu.ops.pallas_fps import furthest_point_sample_with_counts

    fps_fn = jax.jit(lambda x: sum(
        c.sum() for c in furthest_point_sample_with_counts(x, 512, SA1_RADII)[1]))
    t_fps = timeit(fps_fn, xyz, tag="rel-FPS+counts alone")

    print("-" * 60, flush=True)
    print(f"{'tail (full - rel - obj)':44s} {t_full - t_rel - t_obj:9.1f} ms", flush=True)
    print(f"{'rel SA2+SA3 (rel-leg - SA1)':44s} {t_rel - t_sa1:9.1f} ms", flush=True)
    print(f"{'rel selection (SA1 - FPS)':44s} {t_sa1 - t_fps:9.1f} ms", flush=True)
    print(f"{'scenes/s equivalent of full':44s} {S / t_full * 1e3:9.1f}", flush=True)


if __name__ == "__main__":
    main()
