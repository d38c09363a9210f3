"""SGPN — the full scene-graph prediction model.

Reference: `scene_graph_helpers/model/scene_graph_prediction_model.py:30-109`:
  * object encoder: PointNet++ MSG on (O, 4000, 6) crops -> 256-d;
  * relation encoder: PointNet++ MSG on (E, 8000, 7) union crops -> 256-d;
  * TripletGCN (2 layers, hidden 512) over the fully connected scene graph;
  * object head on GCN node features (OBJ_PRED_FROM_GCN) and relation head on
    GCN edge features with subject/object one-hot late fusion;
  * optional image branch: frozen EfficientNet trunk, per-camera features
    reduced to 768/6 and flattened (:98-102).

TPU design: the model consumes a whole :class:`SceneBatch` — scenes stacked
on a leading axis, objects/edges padded to static maxima. Encoders run on the
flattened (S*O, P, C) / (S*E, P, C) axes (one big MXU batch); the GCN runs
per-scene under vmap. Losses are mask-weighted NLL matching torch
`F.nll_loss(weight=...)` semantics (weighted mean).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from or4d_tpu.config import ExperimentConfig
from or4d_tpu.models.heads import ObjectClsHead, RelationClsHead
from or4d_tpu.models.pointnet2 import PointNet2MSGEncoder
from or4d_tpu.models.triplet_gcn import TripletGCN


@dataclasses.dataclass
class SGPNOutputs:
    obj_logprobs: Any  # (S, O, num_classes)
    rel_logprobs: Any  # (S, E, num_relations)
    obj_features: Any  # (S, O, D)
    rel_features: Any  # (S, E, D)
    gcn_obj_features: Any
    gcn_rel_features: Any


jax.tree_util.register_dataclass(
    SGPNOutputs,
    data_fields=["obj_logprobs", "rel_logprobs", "obj_features", "rel_features", "gcn_obj_features", "gcn_rel_features"],
    meta_fields=[],
)


class SGPN(nn.Module):
    num_classes: int = 12
    num_relations: int = 15
    point_feature_size: int = 256
    edge_feature_size: int = 256
    gcn_hidden: int = 512
    gcn_layers: int = 2
    obj_pred_from_gcn: bool = True
    use_image: bool = False
    image_embedding_size: int = 768
    compute_dtype: Any = jnp.float32
    # encoder SA centroid counts (reference 512/128); reduced only in tests
    sa_npoints: tuple[int, int] = (512, 128)
    sa_nsamples: tuple[tuple[int, int], tuple[int, int]] = ((16, 32), (32, 64))
    # extend eval pair sharing to the rel encoder's SA2 (exact; opt-in until
    # measured on-chip — see PointNet2MSGEncoder.paired_sa2)
    paired_sa2: bool = False
    # kernel-emitted slot-pair lane packing for the train chain (exact;
    # measured win 2026-08-19 — default ON, matching TPUConfig; see
    # SetAbstractionMSG.packed_slots)
    packed_slots: bool = True
    # solo-sorted per-scale eval kernels (exact; measured 68.3 vs 66.1
    # scenes/s 2026-08-19 — default ON, see SetAbstractionMSG.per_scale_sort)
    per_scale_sort: bool = True
    # two-gate sub-tile rows for the fused eval kernels (exact tuning knob)
    eval_subtile: int = 32
    # raw-mode train kernels for SA1 (exact for parameter training — see
    # PointNet2MSGEncoder.train_raw). Measured 2026-08-19: +4% at S=8,
    # unlocks the S=10 train peak — default ON.
    train_raw: bool = True
    # solo-sorted per-scale TRAIN gated kernels (exact up to BN-stat
    # reassociation; measured 12.83 vs 12.48 scenes/s 2026-08-19 — default
    # ON, see SetAbstractionMSG.train_per_scale_sort)
    train_per_scale_sort: bool = True
    # MULTI_REL_OUTPUTS (reference network_PointNet.py:274-318
    # PointNetRelClsMulti): sigmoid multi-label relation head — rel_logprobs
    # then carries per-relation probabilities, trained with weighted BCE
    # against (S, E, R) multi-hot gt_rels (data/prep.py multi_rel)
    multi_rel_outputs: bool = False

    @classmethod
    def from_config(cls, cfg: ExperimentConfig, num_classes: int, num_relations: int) -> "SGPN":
        return cls(
            num_classes=num_classes,
            num_relations=num_relations,
            point_feature_size=cfg.model.point_feature_size,
            edge_feature_size=cfg.model.edge_feature_size,
            gcn_hidden=cfg.model.gcn_hidden_feature_size,
            gcn_layers=cfg.model.n_layers,
            obj_pred_from_gcn=cfg.model.obj_pred_from_gcn,
            use_image=cfg.image_input == "full",
            image_embedding_size=cfg.model.full_image_embedding_size,
            compute_dtype=jnp.bfloat16 if cfg.tpu.compute_dtype == "bfloat16" else jnp.float32,
            sa_npoints=tuple(cfg.model.sa_npoints),
            sa_nsamples=tuple(tuple(s) for s in cfg.model.sa_nsamples),
            packed_slots=cfg.tpu.packed_slots,
            per_scale_sort=cfg.tpu.per_scale_sort,
            eval_subtile=cfg.tpu.eval_subtile,
            train_raw=cfg.tpu.train_raw,
            train_per_scale_sort=cfg.tpu.train_per_scale_sort,
            multi_rel_outputs=cfg.model.multi_rel_outputs,
        )

    @nn.compact
    def __call__(self, batch, train: bool = True, pack=None, sa1_caches=None) -> SGPNOutputs:
        """``sa1_caches``: (obj_cache, rel_cache) serving-mode SA1 geometry
        (or4d_tpu/serving.py, built by build_sgpn_sa1_caches for THIS batch's
        pack layout) — the encoders skip FPS/ball query and the raw crops are
        never touched; eval only, unpaired flat packs only."""
        S, O, Po, Co = batch.obj_points.shape
        _, E, Pr, Cr = batch.rel_points.shape

        # geometry stays f32 (FPS/ball-query exactness); the encoders cast
        # features to compute_dtype at each MLP entry
        obj_rows_mask = batch.obj_mask.reshape(S * O).astype(jnp.float32)
        edge_rows_mask = batch.edge_mask.reshape(S * E).astype(jnp.float32)
        sharded_pack = pack is not None and pack.obj_idx.ndim == 2
        # paired eval: pair-shared crops (data/prep.py) + a SlotPack pair plan
        # let the rel encoder run once per unordered pair (shared geometry),
        # emitting both directions' features (models/pointnet2.py)
        paired = (not train) and pack is not None and getattr(pack, "pair_idx", None) is not None
        if sa1_caches is not None:
            # serving: the raw crops never touch the device path — masks come
            # from the (unpaired; flat or dp-sharded) pack the caches were
            # built against (serving.build_sgpn_sa1_caches mirrors this
            # function's gathers, including the per-shard local ones)
            if train or paired:
                raise ValueError("sa1_caches: eval-only, unpaired packs")
            obj_flat = rel_flat = None
            if pack is not None:
                obj_rows_mask = pack.obj_valid.reshape(-1).astype(jnp.float32)
                edge_rows_mask = pack.edge_valid.reshape(-1).astype(jnp.float32)
        else:
            obj_flat = batch.obj_points.reshape(S * O, Po, Co).astype(jnp.float32)
            rel_flat = batch.rel_points.reshape(S * E, Pr, Cr).astype(jnp.float32)
            if sharded_pack:
                # per-dp-shard plans (SlotPack.build(shards=dp)): batched
                # gathers whose indices are local to each shard's scene
                # block, so SPMD keeps them on-chip
                from or4d_tpu.data.scene_batch import gather_rows_local

                obj_flat = gather_rows_local(obj_flat, pack.obj_idx)
                obj_rows_mask = pack.obj_valid.reshape(-1).astype(jnp.float32)
                if paired:
                    rel_flat = gather_rows_local(rel_flat, pack.pair_idx)
                    edge_rows_mask = pack.pair_valid.reshape(-1).astype(jnp.float32)
                else:
                    rel_flat = gather_rows_local(rel_flat, pack.edge_idx)
                    edge_rows_mask = pack.edge_valid.reshape(-1).astype(jnp.float32)
            elif pack is not None:
                # slot packing: run the encoders only over (bucketed) valid
                # rows, then scatter features back into the padded (S, O/E)
                # layout
                obj_flat = jnp.take(obj_flat, pack.obj_idx, axis=0)
                obj_rows_mask = pack.obj_valid.astype(jnp.float32)
                if paired:
                    rel_flat = jnp.take(rel_flat, pack.pair_idx, axis=0)
                    edge_rows_mask = pack.pair_valid.astype(jnp.float32)
                else:
                    rel_flat = jnp.take(rel_flat, pack.edge_idx, axis=0)
                    edge_rows_mask = pack.edge_valid.astype(jnp.float32)
        if paired:
            # (Cp, Pr, 7) forward crops -> (Cp, Pr, 8) with both mask channels
            m = rel_flat[..., 6:7]
            rel_flat = jnp.concatenate(
                [rel_flat[..., :6], m, jnp.where(m > 0, 3.0 - m, 0.0)], axis=-1
            )

        enc = dict(sa_npoints=self.sa_npoints, sa_nsamples=self.sa_nsamples,
                   dtype=self.compute_dtype, packed_slots=self.packed_slots,
                   per_scale_sort=self.per_scale_sort, eval_subtile=self.eval_subtile,
                   train_raw=self.train_raw,
                   train_per_scale_sort=self.train_per_scale_sort)
        obj_cache, rel_cache = sa1_caches if sa1_caches is not None else (None, None)
        obj_feat = PointNet2MSGEncoder(input_dim=Co, out_size=self.point_feature_size, name="obj_encoder", **enc)(
            obj_flat, mask=obj_rows_mask, train=train, sa1_cache=obj_cache
        )
        rel_feat = PointNet2MSGEncoder(
            input_dim=Cr, out_size=self.edge_feature_size, name="rel_encoder",
            paired_sa2=self.paired_sa2, **enc,
        )(rel_flat, mask=edge_rows_mask, train=train, paired=paired, sa1_cache=rel_cache)
        if sharded_pack:
            D = pack.obj_idx.shape[0]

            def scatter_local(feat, idx, valid, rows, width):
                f = (feat * valid.reshape(-1, 1).astype(feat.dtype)).reshape(D, idx.shape[1], width)
                z = jnp.zeros((D, rows // D, width), feat.dtype)
                return z.at[jnp.arange(D)[:, None], idx].add(f).reshape(rows, width)

            obj_feat = scatter_local(obj_feat, pack.obj_idx, pack.obj_valid, S * O, self.point_feature_size)
            if paired:
                rel_feat = scatter_local(
                    rel_feat[0::2], pack.pair_idx, pack.pair_valid, S * E, self.edge_feature_size
                ) + scatter_local(
                    rel_feat[1::2], pack.pair_rev_idx, pack.pair_valid, S * E, self.edge_feature_size
                )
            else:
                rel_feat = scatter_local(rel_feat, pack.edge_idx, pack.edge_valid, S * E, self.edge_feature_size)
        elif pack is not None:
            ov = pack.obj_valid[:, None].astype(obj_feat.dtype)
            obj_feat = jnp.zeros((S * O, self.point_feature_size), obj_feat.dtype).at[pack.obj_idx].add(obj_feat * ov)
            if paired:
                pv = pack.pair_valid[:, None].astype(rel_feat.dtype)
                rel_feat = (
                    jnp.zeros((S * E, self.edge_feature_size), rel_feat.dtype)
                    .at[pack.pair_idx].add(rel_feat[0::2] * pv)
                    .at[pack.pair_rev_idx].add(rel_feat[1::2] * pv)
                )
            else:
                ev = pack.edge_valid[:, None].astype(rel_feat.dtype)
                rel_feat = jnp.zeros((S * E, self.edge_feature_size), rel_feat.dtype).at[pack.edge_idx].add(rel_feat * ev)
        obj_feat = obj_feat.reshape(S, O, self.point_feature_size)
        rel_feat = rel_feat.reshape(S, E, self.edge_feature_size)

        gcn_obj, gcn_rel = TripletGCN(
            num_layers=self.gcn_layers,
            dim_node=self.point_feature_size,
            dim_edge=self.edge_feature_size,
            dim_hidden=self.gcn_hidden,
            name="gcn",
        )(obj_feat, rel_feat, batch.edge_index, batch.obj_mask, batch.edge_mask, train=train)

        obj_in = gcn_obj if self.obj_pred_from_gcn else obj_feat
        obj_logprobs = ObjectClsHead(self.num_classes, name="obj_predictor")(obj_in, train=train)

        image_embeddings = None
        if self.use_image:
            from or4d_tpu.models.efficientnet import ImageBranch

            image_embeddings = ImageBranch(
                embedding_size=self.image_embedding_size, name="image_branch"
            )(batch.images, train=train)  # (S, image_embedding_size)

        rel_logprobs = RelationClsHead(
            self.num_relations, multi_label=self.multi_rel_outputs, name="rel_predictor"
        )(
            gcn_rel,
            relation_objects_one_hot=batch.rel_onehot,
            image_embeddings=image_embeddings,
            train=train,
        )
        return SGPNOutputs(
            obj_logprobs=obj_logprobs.astype(jnp.float32),
            rel_logprobs=rel_logprobs.astype(jnp.float32),
            obj_features=obj_feat,
            rel_features=rel_feat,
            gcn_obj_features=gcn_obj,
            gcn_rel_features=gcn_rel,
        )


def weighted_nll(logprobs: jax.Array, targets: jax.Array, class_weights: jax.Array, mask: jax.Array) -> jax.Array:
    """torch `F.nll_loss(weight=w)` with validity masking: weighted mean of
    -logprob[target], weights w[target]*mask (reference training_step
    :134-145)."""
    picked = jnp.take_along_axis(logprobs, targets[..., None], axis=-1)[..., 0]
    w = class_weights[targets] * mask.astype(logprobs.dtype)
    return -jnp.sum(picked * w) / jnp.maximum(jnp.sum(w), 1e-12)


def weighted_bce(probs: jax.Array, targets: jax.Array, class_weights: jax.Array, mask: jax.Array) -> jax.Array:
    """MULTI_REL_OUTPUTS loss: torch ``F.binary_cross_entropy(weight=w)``
    semantics over (S, E, R) sigmoid probabilities and multi-hot targets —
    per-element w[c] * BCE, averaged over valid-edge elements. The reference
    ships the Multi head without wiring a loss (PointNetRelClsMulti is never
    instantiated); this is the 3DSSG-lineage weighted BCE it was built for."""
    p = jnp.clip(probs.astype(jnp.float32), 1e-7, 1.0 - 1e-7)
    y = targets.astype(jnp.float32)
    bce = -(y * jnp.log(p) + (1.0 - y) * jnp.log1p(-p)) * class_weights
    m = mask.astype(jnp.float32)[..., None]
    return jnp.sum(bce * m) / jnp.maximum(jnp.sum(m) * probs.shape[-1], 1e-12)


def sgpn_loss(outputs: SGPNOutputs, batch, weights_obj: jax.Array, weights_rel: jax.Array, lambda_o: float = 1e-6):
    """loss = lambda_o * obj_nll + rel_nll (reference :139-141); the relation
    term becomes weighted BCE when gt_rels is a multi-hot (MULTI_REL_OUTPUTS,
    in which case rel_logprobs holds sigmoid probabilities)."""
    loss_obj = weighted_nll(outputs.obj_logprobs, batch.gt_class, weights_obj, batch.obj_mask)
    if batch.gt_rels.ndim == outputs.rel_logprobs.ndim:  # (S, E, R) multi-hot
        loss_rel = weighted_bce(outputs.rel_logprobs, batch.gt_rels, weights_rel, batch.edge_mask)
    else:
        loss_rel = weighted_nll(outputs.rel_logprobs, batch.gt_rels, weights_rel, batch.edge_mask)
    loss = lambda_o * loss_obj + loss_rel
    return loss, {"loss_obj": loss_obj, "loss_rel": loss_rel, "loss": loss}
