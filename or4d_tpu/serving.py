"""Serving-mode evaluation: precomputed SA1 geometry cache.

For a FIXED (non-augmented) evaluation set, the geometric skeleton of the
point encoders is a deterministic pure function of each sample: FPS centroid
selection and ball-query neighborhoods depend only on the crop xyz, never on
the weights (reference semantics: pointnet2_utils.py:36-67 FPS,
ball_query_gpu.cu:9-44). The SA1 stage over the raw 4000/8000-point crops is
the dominant eval cost (PERF.md: ~410 of 460 ms per 16-scene batch), so its
geometry is precomputed ONCE per sample:

  * ``new_xyz`` — the 512 FPS centroids per crop row;
  * per scale, the grouped layer-0 planes ``[p_abs | f]`` (absolute support
    xyz + features for every (centroid, slot) hit, first-hit-fill padded) —
    weights-INDEPENDENT, so the cache survives checkpoint changes.

Serving eval then runs SA1 as pure streamed matmuls (delayed-aggregation
arithmetic on the cached planes: dense0(grouped) - dense0(pad(q)), identical
math to the XLA index path in models/pointnet2.py DelayedSharedMLP), and
SA2/SA3 run their normal fused kernels (they operate on the 512 centroids —
single-chunk supports, a small slice of the budget).

The reference re-validates the full val split every epoch
(scene_graph_prediction/main.py:62-66) and serves fixed takes offline — both
are exactly this access pattern. The cache is reported as a SEPARATE,
clearly-labeled serving metric (bench.py --serving); the cold-path benchmark
still measures the full from-raw-points pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from or4d_tpu import ops
from or4d_tpu.ops.pallas_ball_query import ball_query_multiscale


@dataclasses.dataclass
class SA1Cache:
    """Per-row-set SA1 geometry: centroids + grouped layer-0 planes.

    ``channel_major``: grouped planes are slot-flattened channel-major
    (R, C0p, ns*Mp) — lane s*Mp+m holds (slot s, query m) with Mp =
    round_up(M, 8) zero-padded queries, channels (zero-padded to a sublane
    multiple) in sublanes — the layout the fused serving kernel streams at
    full lane utilization with whole slot chunks per MXU op
    (ops/pallas_serving_mlp.py; the natural (R, M, ns, C0) layout puts
    C0=6-7 in the lane dim, a ~18x HBM read blowup). ``c0`` records the true
    channel count under the pad.
    """

    new_xyz: Any  # (R, M, 3) f32
    grouped: Any  # tuple per scale: (R, M, ns, C0) — or (R, C0p, ns*Mp) channel-major
    channel_major: bool = False
    c0: int = 0


jax.tree_util.register_dataclass(
    SA1Cache, data_fields=["new_xyz", "grouped"], meta_fields=["channel_major", "c0"]
)


def build_sa1_cache(pc: jax.Array, npoint: int, scales: tuple[tuple[float, int], ...],
                    dtype=jnp.float32, channel_major: bool = False) -> SA1Cache:
    """One-time geometry precompute for a set of crops ``pc`` (R, P, C):
    FPS -> centroids, ball query per scale -> grouped [p_abs | f] planes.

    Uses the same FPS/ball-query formulations as the model (reference
    selection order, first-hit-fill padding), so the cached neighborhoods
    are the ones the cold path computes. Gathers here are the one-time cost
    the serving path amortizes away.

    ``dtype``: storage dtype of the grouped planes — pass the model's
    compute dtype (bf16 on TPU) to halve cache memory/streaming EXACTLY:
    the cold path casts the very same values to that dtype at each dense
    entry (DelayedSharedMLP.pre/from_grouped), so a dtype-stored cache feeds
    bit-identical matmul inputs. Centroids stay f32 (geometry contract).

    ``channel_major``: emit the fused serving kernel's slot-flattened
    (R, C0p, ns*Mp) layout (see SA1Cache); same values, transposed +
    channel/query-padded.
    """
    xyz = pc[..., :3].astype(jnp.float32)
    feats = pc[..., 3:]
    c0 = pc.shape[-1]
    idx = ops.furthest_point_sample(xyz, npoint)
    new_xyz = jnp.take_along_axis(xyz, idx[..., None], axis=1)  # (R, M, 3)
    scale_idx = ball_query_multiscale(scales, xyz, new_xyz)
    grouped = []
    for qidx in scale_idx:  # (R, M, ns)
        g_xyz = jnp.take_along_axis(xyz[:, :, None, :], qidx[..., None], axis=1)
        g_f = jnp.take_along_axis(feats[:, :, None, :], qidx[..., None], axis=1)
        g = jnp.concatenate([g_xyz, g_f.astype(jnp.float32)], axis=-1).astype(dtype)
        if channel_major:
            # (R, M, ns, C0) -> slot-flattened channel-major (R, C0p, ns*Mp)
            c0p = _round_up(c0, 8)
            R, M, ns, _ = g.shape
            mp = _round_up(M, 8)
            g = g.transpose(0, 3, 2, 1)  # (R, C0, ns, M)
            g = jnp.pad(g, ((0, 0), (0, c0p - c0), (0, 0), (0, mp - M)))
            g = g.reshape(R, c0p, ns * mp)
        grouped.append(g)
    return SA1Cache(new_xyz=new_xyz, grouped=tuple(grouped),
                    channel_major=channel_major, c0=c0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_sgpn_sa1_caches(model, batch, pack=None,
                          channel_major: bool | None = None) -> tuple[SA1Cache, SA1Cache]:
    """(obj_cache, rel_cache) for an SGPN eval batch, matching the row layout
    the model's encoders see (flattened slots, optionally SlotPack-compacted
    — the same gathers models/sgpn.py applies; per-shard local gathers for
    dp-sharded packs). Jit-safe; run once per batch of a fixed eval set.

    ``channel_major``: emit the fused serving kernel's plane layout
    (None = auto: channel-major on the TPU backend, where the kernel runs;
    the natural layout elsewhere — the XLA from_grouped path reads it
    directly)."""
    if channel_major is None:
        channel_major = jax.default_backend() == "tpu"
    S, O, Po, Co = batch.obj_points.shape
    _, E, Pr, Cr = batch.rel_points.shape
    obj_flat = batch.obj_points.reshape(S * O, Po, Co).astype(jnp.float32)
    rel_flat = batch.rel_points.reshape(S * E, Pr, Cr).astype(jnp.float32)
    if pack is not None:
        if getattr(pack, "pair_idx", None) is not None:
            raise ValueError("serving caches are built for unpaired packs (SA1 is skipped entirely)")
        if pack.obj_idx.ndim == 2:
            # dp-sharded pack: indices are LOCAL to each shard's scene block —
            # the ONE gather definition shared with the model
            # (data/scene_batch.py gather_rows_local) keeps the cache row
            # order bit-identical to the encoder-input rows and dp-local
            from or4d_tpu.data.scene_batch import gather_rows_local

            obj_flat = gather_rows_local(obj_flat, pack.obj_idx)
            rel_flat = gather_rows_local(rel_flat, pack.edge_idx)
        else:
            obj_flat = jnp.take(obj_flat, pack.obj_idx, axis=0)
            rel_flat = jnp.take(rel_flat, pack.edge_idx, axis=0)
    from or4d_tpu.models.pointnet2 import SA1_RADII

    sa1_scales = tuple(
        (r, ns) for r, ns in zip(SA1_RADII, model.sa_nsamples[0])
    )
    npoint = model.sa_npoints[0]
    dtype = model.compute_dtype
    return (
        build_sa1_cache(obj_flat, npoint, sa1_scales, dtype=dtype, channel_major=channel_major),
        build_sa1_cache(rel_flat, npoint, sa1_scales, dtype=dtype, channel_major=channel_major),
    )


def _cache_key(batch, dp: int, model, dtype, channel_major: bool = False) -> str:
    """Content key for a persisted serving cache: scan identity + padded
    shapes + validity masks + the geometry config (npoint/nsamples/radii are
    fixed per model) + shard count + storage dtype. Crop CONTENT is assumed
    to be a deterministic function of the scan ids (true for the
    non-augmented dataset pipeline: data/prep.py is seed-free at eval) — a
    changed prep recipe needs a fresh cache_dir."""
    import hashlib

    import numpy as np

    from or4d_tpu.models.pointnet2 import SA1_RADII

    h = hashlib.sha256()
    h.update(repr((
        tuple(batch.scan_ids), tuple(batch.take_idxs),
        tuple(batch.obj_points.shape), tuple(batch.rel_points.shape), dp,
        tuple(model.sa_npoints), tuple(tuple(s) for s in model.sa_nsamples),
        # layout version 3 = slot-flattened channel-major (R, C0p, ns*Mp);
        # bumping invalidates persisted v2 (R, ns, C0p, M) caches
        tuple(SA1_RADII), str(np.dtype(dtype)), 3 if channel_major else 0,
    )).encode())
    h.update(np.ascontiguousarray(np.asarray(batch.obj_mask)).tobytes())
    h.update(np.ascontiguousarray(np.asarray(batch.edge_mask)).tobytes())
    return h.hexdigest()[:24]


def _save_caches(path, caches) -> None:
    """Persist an (obj, rel) SA1Cache pair as one npz. bfloat16 planes are
    stored as uint16 bit patterns (numpy cannot round-trip ml_dtypes arrays
    through np.save) with the true dtype recorded in a JSON meta entry."""
    import json

    import ml_dtypes
    import numpy as np

    arrays, meta = {}, {}
    for prefix, c in (("obj", caches[0]), ("rel", caches[1])):
        arrays[f"{prefix}_new_xyz"] = np.asarray(c.new_xyz)
        meta[f"{prefix}_n"] = len(c.grouped)
        meta[f"{prefix}_cm"] = bool(c.channel_major)
        meta[f"{prefix}_c0"] = int(c.c0)
        for i, g in enumerate(c.grouped):
            g = np.asarray(g)
            if g.dtype == ml_dtypes.bfloat16:
                arrays[f"{prefix}_g{i}"] = g.view(np.uint16)
                meta[f"{prefix}_g{i}"] = "bfloat16"
            else:
                arrays[f"{prefix}_g{i}"] = g
                meta[f"{prefix}_g{i}"] = str(g.dtype)
    arrays["meta"] = np.array(json.dumps(meta))
    np.savez_compressed(path, **arrays)


def _load_caches(path):
    """Inverse of :func:`_save_caches`; returns host-resident caches."""
    import json

    import ml_dtypes
    import numpy as np

    z = np.load(path)
    meta = json.loads(str(z["meta"]))

    def one(prefix):
        grouped = []
        for i in range(int(meta[f"{prefix}_n"])):
            g = z[f"{prefix}_g{i}"]
            if meta[f"{prefix}_g{i}"] == "bfloat16":
                g = g.view(ml_dtypes.bfloat16)
            grouped.append(g)
        return SA1Cache(new_xyz=z[f"{prefix}_new_xyz"], grouped=tuple(grouped),
                        channel_major=bool(meta.get(f"{prefix}_cm", False)),
                        c0=int(meta.get(f"{prefix}_c0", 0)))

    return one("obj"), one("rel")


class ServingEvaluator:
    """Repeated evaluation over a fixed batch list (the reference's
    validate-every-epoch loop): geometry caches are built once, then every
    ``evaluate(state)`` call runs the serving fast path.

    ``offload``: keep caches in HOST memory between calls and stream each
    batch's cache to the device inside evaluate (transfers overlap compute in
    a pipelined deployment). "auto" offloads once the resident caches exceed
    ``device_budget_bytes`` — a full val split's grouped planes (~0.9 GB per
    16-scene batch at paper shapes) cannot all live in HBM at once.

    ``cache_dir``: persist each batch's geometry cache to disk (one npz per
    batch, content-keyed — see :func:`_cache_key`); a serving restart then
    skips the whole FPS/ball-query precompute and loads the planes instead.

    Multi-chip: on a dp-only mesh (trainer.cfg.tpu.mesh_data > 1) the batch,
    per-shard pack, and cache rows are sharded over 'dp' — cache rows are
    D*cap with per-shard-local indices, so every SA1 matmul stays on its
    scenes' chip (same SPMD layout as the cold sharded-pack path). mp>1
    meshes are rejected: slot packing (which the caches are built against)
    is dp-only (train/loop.py:_pack_for)."""

    def __init__(self, trainer, batches, offload: bool | str = "auto",
                 device_budget_bytes: int = 4 << 30, cache_dir=None,
                 channel_major: bool | None = None):
        import dataclasses as dc
        from pathlib import Path

        import numpy as np

        from or4d_tpu.data.scene_batch import SlotPack

        if cache_dir is not None:
            cache_dir = Path(cache_dir)
            cache_dir.mkdir(parents=True, exist_ok=True)

        self.trainer = trainer
        self.batches = []
        mesh = getattr(trainer, "mesh", None)
        self.mesh = mesh if (mesh is not None and mesh.devices.size > 1) else None
        if self.mesh is not None and self.mesh.shape["mp"] != 1:
            raise ValueError(
                "ServingEvaluator needs a dp-only mesh (slot packing, which the "
                "SA1 caches are built against, is disabled on mp>1 — "
                "train/loop.py:_pack_for)"
            )
        # channel-major planes on the TPU backend (the fused serving kernel's
        # layout); the natural layout elsewhere (XLA from_grouped path).
        # ``channel_major`` overrides the auto choice (tests; off-TPU the
        # model's cache branch restores the row layout, so either works).
        self._cm = (jax.default_backend() == "tpu") if channel_major is None else channel_major
        self._build = jax.jit(
            lambda b, p: build_sgpn_sa1_caches(trainer.model, b, p, channel_major=self._cm)
        )
        self._cache_sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._cache_sharding = NamedSharding(self.mesh, P("dp"))

        def strip_points(b):
            # The serving path never reads the raw crops (SGPN's serving
            # branch uses only their shapes/masks) — at paper shapes they are
            # ~2 GB f32 per 16-scene batch, so pinning them per batch for the
            # evaluator's lifetime would dwarf the caches. Keep 1-point
            # stand-ins (static rank/channel count preserved for the trace).
            S, O, _, Co = b.obj_points.shape
            _, E, _, Cr = b.rel_points.shape
            return dc.replace(
                b,
                obj_points=np.zeros((S, O, 1, Co), np.float32),
                rel_points=np.zeros((S, E, 1, Cr), np.float32),
            )

        def to_host(c):
            return jax.tree_util.tree_map(np.asarray, jax.device_get(c))

        def place(c):
            return (
                jax.device_put(c, self._cache_sharding)
                if self._cache_sharding is not None
                else jax.device_put(c)
            )

        offload_now = offload is True
        resident = 0
        for batch in batches:
            dp = self.mesh.shape["dp"] if self.mesh is not None else 1
            if self.mesh is not None and batch.num_scenes % dp:
                batch = batch.pad_scenes(dp)
            cache_file = (
                cache_dir / f"sa1_{_cache_key(batch, dp, trainer.model, trainer.model.compute_dtype, self._cm)}.npz"
                if cache_dir is not None
                else None
            )
            if self.mesh is not None:
                from or4d_tpu.parallel.mesh import shard_batch

                pack = SlotPack.build(batch, shards=dp)
                pack = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, self._cache_sharding), pack
                )
                if cache_file is not None and cache_file.exists():
                    caches = _load_caches(cache_file)  # host; placed below
                else:
                    full = shard_batch(batch, self.mesh)  # temp: cache build only
                    caches = jax.device_put(self._build(full, pack), self._cache_sharding)
                    del full
                    if cache_file is not None:
                        caches = to_host(caches)
                        _save_caches(cache_file, caches)
                batch = shard_batch(strip_points(batch), self.mesh)
            else:
                pack = jax.device_put(SlotPack.build(batch))
                if cache_file is not None and cache_file.exists():
                    caches = _load_caches(cache_file)  # host; placed below
                else:
                    full = jax.device_put(batch)  # temp: cache build only
                    caches = self._build(full, pack)
                    del full
                    if cache_file is not None:
                        caches = to_host(caches)
                        _save_caches(cache_file, caches)
                batch = jax.device_put(strip_points(batch))
            # offload decisions are made per batch, INSIDE the build loop, so
            # peak device residency never exceeds the budget by more than one
            # batch's cache — a full val split's grouped planes can't all
            # live in HBM at once (docstring math)
            if not offload_now and offload == "auto":
                resident += sum(x.nbytes for x in jax.tree_util.tree_leaves(caches))
                if resident > device_budget_bytes:
                    offload_now = True
                    for entry in self.batches:
                        entry[2] = to_host(entry[2])
                        entry[3] = True
            if offload_now:
                caches = to_host(caches)
            else:
                caches = place(caches)  # no-op for already-placed device trees
            self.batches.append([batch, pack, caches, offload_now])
        self._eval = jax.jit(
            lambda state, b, p, c: trainer.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                b, train=False, pack=p, sa1_caches=c,
            ).rel_logprobs
        )

    def evaluate(self, state, verbose: bool = False) -> float:
        import numpy as np

        from or4d_tpu.train.loop import _gather_eval
        from or4d_tpu.train.metrics import RelationMetricAccumulator

        acc = RelationMetricAccumulator(list(self.trainer.vocab.relation_names))
        if self.mesh is not None:
            # replicate params/batch_stats over the mesh (no-op when the
            # state already lives there, e.g. straight out of init_state)
            from or4d_tpu.parallel.mesh import replicated

            state = jax.device_put(state, replicated(self.mesh))

        def dispatch(entry):
            batch, pack, caches, offloaded = entry
            if offloaded:
                caches = (
                    jax.device_put(caches, self._cache_sharding)
                    if self._cache_sharding is not None
                    else jax.device_put(caches)
                )
            return batch, self._eval(state, batch, pack, caches)

        # one-batch lookahead (utils/stream.py): batch i+1's cache upload +
        # eval are dispatched BEFORE batch i's logits are pulled, overlapping
        # device compute/transfers with the (slow) host pull while keeping at
        # most TWO batches' caches device-resident (the offload bound holds)
        from or4d_tpu.utils.stream import lookahead

        lookahead(
            self.batches,
            dispatch,
            lambda pair: acc.update_batch(pair[0], np.asarray(_gather_eval(pair[1]))),
        )
        if verbose:
            for take, report in acc.per_take_reports().items():
                print(f"\nTake {take}\n{report.to_text()}")
        return acc.macro_f1
