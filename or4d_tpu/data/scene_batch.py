"""Fixed-shape scene containers — the central TPU idiom.

The reference feeds batch_size=1 ragged samples (n objects, n(n-1) edges,
variable crop sizes) through collate_fn (or_dataset.py:63-74). Here a scene is
padded once to (max_objects, max_edges) static shapes so scenes can be
stacked, vmapped, and sharded over a device mesh; masks carry validity.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np


@dataclasses.dataclass
class SceneSample:
    """One padded scene (host-side numpy).

    Shapes (O = max_objects, E = max_edges, Po/Pr = points per obj/rel crop):
      obj_points   (O, Po, 6)  xyz (zero-mean/unit-sphere) + rgb
      rel_points   (E, Pr, 7)  xyz + rgb + mask channel (1=subject, 2=object)
      edge_index   (E, 2)      (src, dst) object-slot indices; 0 on padding
      rel_onehot   (E, 12)     subject/object coarse-type one-hots, late-fused
      gt_class     (O,)        object class ids; 0 on padding (masked in loss)
      gt_rels      (E,)        relation ids; none_index on padding
                   (E, R)      multi-hot float32 when MULTI_REL_OUTPUTS
      obj_mask     (O,)        bool
      edge_mask    (E,)        bool
      rel_hand_points (E, 2, 3) wrist locations in the rel crop frame
    """

    obj_points: np.ndarray
    rel_points: np.ndarray
    edge_index: np.ndarray
    rel_onehot: np.ndarray
    gt_class: np.ndarray
    gt_rels: np.ndarray
    obj_mask: np.ndarray
    edge_mask: np.ndarray
    rel_hand_points: np.ndarray
    scan_id: str = ""
    take_idx: int = 0
    # slot -> object name, for infer-time relation JSON emission
    # (reference predict_step uses objs_json[edge+1], scene_graph_prediction_model.py:165-175)
    slot_names: tuple[str, ...] = ()
    images: np.ndarray | None = None  # (6, H, W, 3) when IMAGE_INPUT == 'full'

    @property
    def num_objects(self) -> int:
        return int(self.obj_mask.sum())

    @property
    def num_edges(self) -> int:
        return int(self.edge_mask.sum())


# array fields stacked into the device batch, in order
_ARRAY_FIELDS = (
    "obj_points", "rel_points", "edge_index", "rel_onehot",
    "gt_class", "gt_rels", "obj_mask", "edge_mask", "rel_hand_points",
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SceneBatch:
    """A stack of S padded scenes — the device-side training batch pytree.

    Every array gains a leading scene axis; metadata (scan ids, slot names)
    stays on host as aux data.
    """

    obj_points: Any
    rel_points: Any
    edge_index: Any
    rel_onehot: Any
    gt_class: Any
    gt_rels: Any
    obj_mask: Any
    edge_mask: Any
    rel_hand_points: Any
    images: Any = None
    scan_ids: tuple[str, ...] = ()
    take_idxs: tuple[int, ...] = ()
    slot_names: tuple[tuple[str, ...], ...] = ()

    @classmethod
    def stack(cls, samples: list[SceneSample]) -> "SceneBatch":
        arrays = {f: np.stack([getattr(s, f) for s in samples]) for f in _ARRAY_FIELDS}
        images = None
        if samples[0].images is not None:
            images = np.stack([s.images for s in samples])
        return cls(
            **arrays,
            images=images,
            scan_ids=tuple(s.scan_id for s in samples),
            take_idxs=tuple(s.take_idx for s in samples),
            slot_names=tuple(s.slot_names for s in samples),
        )

    @property
    def num_scenes(self) -> int:
        return self.obj_points.shape[0]

    def pad_scenes(self, multiple: int) -> "SceneBatch":
        """Pad the scene axis to a multiple (mesh divisibility) with dummy
        scenes whose masks are all-False — masked loss/BN/metrics ignore
        them, so padding is semantically inert."""
        S = self.num_scenes
        pad = (-S) % multiple
        if pad == 0:
            return self
        kwargs = {}
        for f in _ARRAY_FIELDS:
            a = np.asarray(getattr(self, f))
            widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            kwargs[f] = np.pad(a, widths)
        images = None
        if self.images is not None:
            a = np.asarray(self.images)
            images = np.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        return SceneBatch(
            **kwargs,
            images=images,
            scan_ids=self.scan_ids,
            take_idxs=self.take_idxs,
            slot_names=self.slot_names,
        )

    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in _ARRAY_FIELDS) + (self.images,)
        aux = (self.scan_ids, self.take_idxs, self.slot_names)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        kwargs = dict(zip(_ARRAY_FIELDS, children[:-1]))
        return cls(**kwargs, images=children[-1], scan_ids=aux[0], take_idxs=aux[1], slot_names=aux[2])


def is_pair_shared(batch: "SceneBatch") -> bool:
    """True when every valid edge has its reverse in the same scene and the
    first pair's crops are direction-invariant (prep pair_shared=True) — the
    precondition for SlotPack.build(paired=True)."""
    eidx = np.asarray(batch.edge_index)
    emask = np.asarray(batch.edge_mask)
    rp = np.asarray(batch.rel_points)
    checked = False
    for s in range(emask.shape[0]):
        slot_of = {(int(a), int(b)): e for e, (a, b) in enumerate(eidx[s]) if emask[s, e]}
        for (a, b), e in slot_of.items():
            if (b, a) not in slot_of:
                return False
            if not checked and a < b:
                er = slot_of[(b, a)]
                f, r = rp[s, e], rp[s, er]
                if not (
                    np.array_equal(f[:, :6], r[:, :6])
                    and np.array_equal(np.where(f[:, 6] > 0, 3.0 - f[:, 6], 0.0), r[:, 6])
                ):
                    return False
                checked = True
    return checked


def gather_rows_local(flat, idx):
    """Per-dp-shard batched gather for sharded SlotPack plans: ``flat``
    (D*rows, ...) viewed as (D, rows, ...) blocks, ``idx`` (D, cap) LOCAL to
    each shard's block -> (D*cap, ...). SPMD keeps every gather on its
    shard's chip. The single definition is the layout contract between the
    model's encoder-input gathers (models/sgpn.py) and the serving-cache
    build that must mirror them row-for-row (serving.build_sgpn_sa1_caches)."""
    import jax.numpy as jnp

    D = idx.shape[0]
    g = jnp.take_along_axis(
        flat.reshape((D, flat.shape[0] // D) + flat.shape[1:]),
        idx.reshape(idx.shape + (1,) * (flat.ndim - 1)),
        axis=1,
    )
    return g.reshape((D * idx.shape[1],) + flat.shape[1:])


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SlotPack:
    """Packing plan: valid object/edge slots compacted to the front.

    Built on host from the (static per-batch) masks so the encoders process
    only ~sum(valid) rows instead of S*max slots; results scatter back into
    the padded layout for the GCN. Capacities are bucketed so jit re-traces
    only when a batch crosses a bucket boundary.

      obj_idx  (Co,) flat indices into S*O; obj_valid (Co,) bool
      edge_idx (Ce,) flat indices into S*E; edge_valid (Ce,) bool

    With ``paired=True`` (requires a batch prepared with pair_shared crops,
    data/prep.py), a pair plan is added so the eval path encodes each
    unordered pair once and scatters both directions:

      pair_idx     (Cp,) flat edge-slot indices of the FORWARD (a<b) edges
      pair_rev_idx (Cp,) flat edge-slot indices of the matching (b,a) edges
      pair_valid   (Cp,) bool
    """

    obj_idx: Any
    obj_valid: Any
    edge_idx: Any
    edge_valid: Any
    pair_idx: Any = None
    pair_rev_idx: Any = None
    pair_valid: Any = None

    @classmethod
    def build(cls, batch: "SceneBatch", bucket: int = 128, shards: int = 1, paired: bool = False) -> "SlotPack":
        """shards=1: flat plan (indices into the global S*slots axis).
        shards>1: per-data-shard plans of a COMMON bucketed capacity, with
        indices LOCAL to each shard's (S/shards)*slots block — the model's
        gathers then stay within each dp shard (no cross-chip collectives).
        Arrays are (shards, cap)."""

        def plan(mask):
            flat = np.asarray(mask).reshape(-1)
            idx = np.nonzero(flat)[0]
            cap = max(bucket, int(np.ceil(len(idx) / bucket)) * bucket)
            cap = min(cap, len(flat))
            valid = np.zeros(cap, bool)
            valid[: len(idx)] = True
            padded = np.zeros(cap, np.int32)
            padded[: len(idx)] = idx
            return padded, valid

        def plan_sharded(mask):
            m = np.asarray(mask)
            S = m.shape[0]
            assert S % shards == 0, f"{S} scenes not divisible by {shards} shards"
            per = S // shards
            locals_ = [np.nonzero(m[d * per : (d + 1) * per].reshape(-1))[0] for d in range(shards)]
            need = max(len(l) for l in locals_)
            cap = max(bucket, int(np.ceil(need / bucket)) * bucket)
            cap = min(cap, per * int(np.prod(m.shape[1:])))
            idx = np.zeros((shards, cap), np.int32)
            valid = np.zeros((shards, cap), bool)
            for d, l in enumerate(locals_):
                idx[d, : len(l)] = l
                valid[d, : len(l)] = True
            return idx, valid

        p = plan if shards == 1 else plan_sharded
        oi, ov = p(batch.obj_mask)
        ei, ev = p(batch.edge_mask)
        if not paired:
            return cls(obj_idx=oi, obj_valid=ov, edge_idx=ei, edge_valid=ev)

        # pair plan: for every valid forward edge (a < b) find the slot of
        # its reverse (b, a) within the same scene
        eidx = np.asarray(batch.edge_index)  # (S, E, 2)
        emask = np.asarray(batch.edge_mask)
        S, E = emask.shape
        fwd_flat, rev_flat = [], []
        for s in range(S):
            slot_of = {(int(a), int(b)): e for e, (a, b) in enumerate(eidx[s]) if emask[s, e]}
            for (a, b), e in slot_of.items():
                if a < b:
                    er = slot_of.get((b, a))
                    if er is None:
                        raise ValueError(f"scene {s}: edge ({a},{b}) has no reverse — not a pair-shared batch")
                    fwd_flat.append(s * E + e)
                    rev_flat.append(s * E + er)
        if fwd_flat:
            # sanity: pair-shared crops really are direction-invariant in
            # xyz/rgb and mask-swapped (guards against packing a batch that
            # was prepared without pair_shared)
            rp = np.asarray(batch.rel_points).reshape(S * E, *batch.rel_points.shape[2:])
            f0, r0 = rp[fwd_flat[0]], rp[rev_flat[0]]
            if not (np.array_equal(f0[:, :6], r0[:, :6])
                    and np.array_equal(np.where(f0[:, 6] > 0, 3.0 - f0[:, 6], 0.0), r0[:, 6])):
                raise ValueError("paired=True but rel crops are not pair-shared (prepare_scene(pair_shared=True))")

        def pair_plan(flat_list):
            idx = np.asarray(flat_list, np.int64)
            cap = max(bucket, int(np.ceil(max(len(idx), 1) / bucket)) * bucket)
            cap = min(cap, S * E)
            padded = np.zeros(cap, np.int32)
            padded[: len(idx)] = idx
            valid = np.zeros(cap, bool)
            valid[: len(idx)] = True
            return padded, valid

        if shards == 1:
            pi, pv = pair_plan(fwd_flat)
            pr, _ = pair_plan(rev_flat)
        else:
            per = S // shards
            fwd_a, rev_a = np.asarray(fwd_flat, np.int64), np.asarray(rev_flat, np.int64)
            shard_of = fwd_a // (per * E)
            locs = [np.nonzero(shard_of == d)[0] for d in range(shards)]
            need = max(max((len(l) for l in locs), default=1), 1)
            cap = max(bucket, int(np.ceil(need / bucket)) * bucket)
            cap = min(cap, per * E)
            pi = np.zeros((shards, cap), np.int32)
            pr = np.zeros((shards, cap), np.int32)
            pv = np.zeros((shards, cap), bool)
            for d, l in enumerate(locs):
                pi[d, : len(l)] = fwd_a[l] - d * per * E
                pr[d, : len(l)] = rev_a[l] - d * per * E
                pv[d, : len(l)] = True
        return cls(obj_idx=oi, obj_valid=ov, edge_idx=ei, edge_valid=ev,
                   pair_idx=pi, pair_rev_idx=pr, pair_valid=pv)
