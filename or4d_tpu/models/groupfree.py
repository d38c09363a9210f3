"""Group-Free 3D object detection — TPU-native.

Reference: `external_src/group_free_3D/models/*` adapted to 4D-OR
(num_class=4, num_heading_bin=12, num_size_cluster=4, 200k input points,
num_proposal=128):

  * backbone (backbone_module.py:12-110): PointNet++ SSG, 4 SA stages
    (2048/r.2/ns64 -> 1024/r.4/ns32 -> 512/r.8/ns16 -> 256/r1.2/ns16) with
    normalize_xyz, then 2 FP stages interpolating back to 1024 seeds, 288-d;
  * KPS sampling (modules.py:10-95, detector.py:61-67): per-seed objectness
    MLP, top-num_proposal seeds become object candidates;
  * 6 transformer decoder layers with learned xyz position embeddings
    (detector.py:78-123, transformer.py) — candidates cross-attend to all
    seeds; each layer has its own PredictHead;
  * PredictHead (modules.py:98+): objectness, center residual (offset from
    candidate xyz, scaled), heading bin (12) + residual, size class (4) +
    residual against mean sizes, semantic class logits.

TPU design: fixed shapes end to end; FPS/ball-query/3-NN come from
or4d_tpu.ops (Pallas/XLA); channels-last everywhere; the per-layer heads
run under one compiled graph.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from or4d_tpu import ops
from or4d_tpu.models.layers import MaskedBatchNorm, SharedMLP

NUM_CLASS = 4
NUM_HEADING_BIN = 12
NUM_SIZE_CLUSTER = 4
SEED_DIM = 288


class SAVotes(nn.Module):
    """PointnetSAModuleVotes (single scale, normalize_xyz=True)."""

    npoint: int
    radius: float
    nsample: int
    mlp: tuple[int, ...]

    @nn.compact
    def __call__(self, xyz, features, train=True):
        from or4d_tpu.ops.pallas_ball_query import ball_query_multiscale

        idx = jax.lax.stop_gradient(ops.furthest_point_sample(xyz, self.npoint))
        new_xyz = jnp.take_along_axis(xyz, idx[..., None], axis=1)
        qidx = jax.lax.stop_gradient(ball_query_multiscale(((self.radius, self.nsample),), xyz, new_xyz)[0])
        grouped_xyz = jnp.take_along_axis(xyz[:, :, None, :], qidx[..., None], axis=1) - new_xyz[:, :, None, :]
        grouped_xyz = grouped_xyz / self.radius  # normalize_xyz
        if features is not None:
            grouped_f = jnp.take_along_axis(features[:, :, None, :], qidx[..., None], axis=1)
            grouped = jnp.concatenate([grouped_xyz, grouped_f], axis=-1)
        else:
            grouped = grouped_xyz
        h = SharedMLP(self.mlp, name="mlp")(grouped, train=train)
        return new_xyz, jnp.max(h, axis=2), idx


class FPStage(nn.Module):
    """PointnetFPModule: 3-NN inverse-distance feature propagation + MLP."""

    mlp: tuple[int, ...]

    @nn.compact
    def __call__(self, unknown_xyz, known_xyz, unknown_feats, known_feats, train=True):
        dist, idx = ops.three_nn(unknown_xyz, known_xyz)
        idx = jax.lax.stop_gradient(idx)
        recip = 1.0 / (dist + 1e-8)
        weight = recip / jnp.sum(recip, axis=2, keepdims=True)
        interp = ops.three_interpolate(jnp.swapaxes(known_feats, 1, 2), idx, weight)
        interp = jnp.swapaxes(interp, 1, 2)  # (B, n, C)
        h = jnp.concatenate([interp, unknown_feats], axis=-1) if unknown_feats is not None else interp
        return SharedMLP(self.mlp, name="mlp")(h, train=train)


class Backbone(nn.Module):
    """Pointnet2Backbone: 4x SA + 2x FP -> 1024 seeds, 288-d."""

    width: int = 1

    @nn.compact
    def __call__(self, pc, train=True):
        w = self.width
        xyz = pc[..., :3].astype(jnp.float32)
        features = pc[..., 3:] if pc.shape[-1] > 3 else None
        sa1_xyz, sa1_f, sa1_idx = SAVotes(2048, 0.2, 64, (64 * w, 64 * w, 128 * w), name="sa1")(xyz, features, train)
        sa2_xyz, sa2_f, sa2_idx = SAVotes(1024, 0.4, 32, (128 * w, 128 * w, 256 * w), name="sa2")(sa1_xyz, sa1_f, train)
        sa3_xyz, sa3_f, _ = SAVotes(512, 0.8, 16, (128 * w, 128 * w, 256 * w), name="sa3")(sa2_xyz, sa2_f, train)
        sa4_xyz, sa4_f, _ = SAVotes(256, 1.2, 16, (128 * w, 128 * w, 256 * w), name="sa4")(sa3_xyz, sa3_f, train)
        f3 = FPStage((256 * w, 256 * w), name="fp1")(sa3_xyz, sa4_xyz, sa3_f, sa4_f, train)
        f2 = FPStage((256 * w, SEED_DIM), name="fp2")(sa2_xyz, sa3_xyz, sa2_f, f3, train)
        # seed indices into the ORIGINAL cloud (reference fp2_inds,
        # backbone_module.py:127: composed rather than relying on the
        # FPS-prefix property)
        seed_inds = jnp.take_along_axis(sa1_idx, sa2_idx, axis=1)
        return sa2_xyz, f2, seed_inds  # (B, 1024, 3), (B, 1024, 288), (B, 1024)


class PointsObjCls(nn.Module):
    """Per-seed objectness scorer (modules.py:10-38)."""

    dim: int = SEED_DIM

    @nn.compact
    def __call__(self, feats, train=True):
        h = SharedMLP((self.dim, self.dim), name="mlp")(feats, train=train)
        return nn.Dense(1, name="logit")(h)[..., 0]  # (B, K)


class PositionEmbedding(nn.Module):
    """Learned xyz position embedding (modules.py:41-57)."""

    dim: int = SEED_DIM

    @nn.compact
    def __call__(self, xyz, train=True):
        h = nn.Dense(self.dim, name="fc1")(xyz)
        h = MaskedBatchNorm(self.dim, name="bn")(h, train=train)
        h = nn.relu(h)
        return nn.Dense(self.dim, name="fc2")(h)


class DecoderLayer(nn.Module):
    """transformer.py TransformerDecoderLayer: self-attn over candidates,
    cross-attn to seeds, FFN; post-norm; position embeddings added to q/k."""

    dim: int = SEED_DIM
    heads: int = 8
    ffn: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, query_pos, key, key_pos, train=True):
        def mha(q, k, v, name):
            return nn.MultiHeadDotProductAttention(
                num_heads=self.heads, qkv_features=self.dim, name=name,
                deterministic=not train, dropout_rate=self.dropout,
            )(q, k, v)

        q = query + query_pos
        h = query + mha(q, q, query, "self_attn")
        h = nn.LayerNorm(name="norm1")(h)
        h2 = h + mha(h + query_pos, key + key_pos, key, "cross_attn")
        h2 = nn.LayerNorm(name="norm2")(h2)
        f = nn.Dense(self.ffn, name="ffn1")(h2)
        f = nn.relu(f)
        f = nn.Dense(self.dim, name="ffn2")(f)
        out = nn.LayerNorm(name="norm3")(h2 + f)
        return out


class PredictHead(nn.Module):
    """modules.py PredictHead: box parametrization per candidate."""

    num_class: int = NUM_CLASS
    num_heading_bin: int = NUM_HEADING_BIN
    num_size_cluster: int = NUM_SIZE_CLUSTER

    @nn.compact
    def __call__(self, feats, base_xyz, mean_size_arr, train=True):
        h = SharedMLP((SEED_DIM, SEED_DIM), name="mlp")(feats, train=train)
        objectness = nn.Dense(1, name="objectness")(h)[..., 0]
        center = base_xyz + nn.Dense(3, name="center_residual")(h)
        heading_scores = nn.Dense(self.num_heading_bin, name="heading_cls")(h)
        heading_residual = nn.Dense(self.num_heading_bin, name="heading_res")(h) * (
            np.pi / self.num_heading_bin
        )
        size_scores = nn.Dense(self.num_size_cluster, name="size_cls")(h)
        size_residual = nn.Dense(self.num_size_cluster * 3, name="size_res")(h).reshape(
            h.shape[:-1] + (self.num_size_cluster, 3)
        ) * mean_size_arr[None, None]
        sem_scores = nn.Dense(self.num_class, name="sem_cls")(h)
        return {
            "objectness": objectness,
            "center": center,
            "heading_scores": heading_scores,
            "heading_residual": heading_residual,
            "size_scores": size_scores,
            "size_residual": size_residual,
            "sem_scores": sem_scores,
        }


class GroupFreeDetector(nn.Module):
    """detector.py GroupFreeDetector with KPS sampling, 6 decoder layers."""

    num_class: int = NUM_CLASS
    num_proposal: int = 128
    num_decoder_layers: int = 6
    width: int = 1

    @nn.compact
    def __call__(self, pc, mean_size_arr, train=True):
        seed_xyz, seed_feats, seed_inds = Backbone(width=self.width, name="backbone")(pc, train)

        # KPS: top-num_proposal seeds by objectness
        obj_logits = PointsObjCls(name="points_obj_cls")(seed_feats, train)
        _, top_idx = jax.lax.top_k(obj_logits, self.num_proposal)
        top_idx = jax.lax.stop_gradient(top_idx)
        cand_xyz = jnp.take_along_axis(seed_xyz, top_idx[..., None], axis=1)
        cand_feats = jnp.take_along_axis(seed_feats, top_idx[..., None], axis=1)

        outputs = {"seeds_obj_cls_logits": obj_logits, "sample_inds": top_idx, "seed_inds": seed_inds,
                   "seed_xyz": seed_xyz}
        outputs["proposal"] = PredictHead(name="proposal_head")(cand_feats, cand_xyz, mean_size_arr, train)

        query = nn.Dense(SEED_DIM, name="decoder_query_proj")(cand_feats)
        key = nn.Dense(SEED_DIM, name="decoder_key_proj")(seed_feats)
        base_xyz = outputs["proposal"]["center"]
        layer_outputs = []
        for i in range(self.num_decoder_layers):
            qpos = PositionEmbedding(name=f"self_pos_{i}")(jax.lax.stop_gradient(base_xyz), train)
            kpos = PositionEmbedding(name=f"cross_pos_{i}")(seed_xyz, train)
            query = DecoderLayer(name=f"decoder_{i}")(query, qpos, key, kpos, train)
            head_out = PredictHead(name=f"head_{i}")(query, jax.lax.stop_gradient(base_xyz), mean_size_arr, train)
            base_xyz = head_out["center"]
            layer_outputs.append(head_out)
        outputs["layers"] = layer_outputs
        outputs["last"] = layer_outputs[-1]
        return outputs


# ---------------------------------------------------------------------------
# box decoding + NMS + AP evaluation (ap_helper.py / utils/{nms,eval_det}.py)
# ---------------------------------------------------------------------------

def decode_boxes(head_out: dict, mean_size_arr: np.ndarray):
    """Head outputs -> (center (B,K,3), size (B,K,3), heading (B,K), class,
    score) via argmax over bins/clusters (ap_helper.py box parsing)."""
    heading_cls = jnp.argmax(head_out["heading_scores"], axis=-1)
    heading_res = jnp.take_along_axis(head_out["heading_residual"], heading_cls[..., None], axis=-1)[..., 0]
    angle_per_class = 2 * np.pi / NUM_HEADING_BIN
    heading = heading_cls * angle_per_class + heading_res
    # wrap to [-pi, pi] (model_util angle decoding)
    heading = jnp.where(heading > np.pi, heading - 2 * np.pi, heading)

    size_cls = jnp.argmax(head_out["size_scores"], axis=-1)
    size_res = jnp.take_along_axis(
        head_out["size_residual"], size_cls[..., None, None].repeat(3, -1), axis=-2
    )[..., 0, :]
    size = jnp.asarray(mean_size_arr)[size_cls] + size_res

    sem_cls = jnp.argmax(head_out["sem_scores"], axis=-1)
    score = jax.nn.sigmoid(head_out["objectness"]) * jnp.max(
        jax.nn.softmax(head_out["sem_scores"], axis=-1), axis=-1
    )
    return head_out["center"], jnp.maximum(size, 1e-3), heading, sem_cls, score


def nms_3d_samecls(centers, sizes, scores, headings=None, classes=None, iou_threshold=0.25):
    """The reference's shipped NMS (ap_helper.py:168-189, use_3d_nms +
    cls_nms): axis-aligned IoU over the AABBs of the heading-rotated corners,
    same-class suppression only. Heading/classes default to zeros."""
    from or4d_tpu.ops.box_geometry import nms_3d_samecls as _nms

    centers = np.asarray(centers)
    headings = np.zeros(len(centers)) if headings is None else headings
    classes = np.zeros(len(centers), np.int64) if classes is None else classes
    return _nms(centers, sizes, headings, scores, classes, iou_threshold)


def eval_average_precision(pred_by_scan: dict, gt_by_scan: dict, iou_threshold: float = 0.25):
    """Per-class AP at an IoU threshold (utils/eval_det.py with get_iou_obb:
    ORIENTED 3D IoU over heading-rotated corners, VOC-style AP).

    ``pred_by_scan``: {scan: [(cls, center, size, heading, score), ...]};
    ``gt_by_scan``: {scan: [(cls, center, size, heading), ...]}.
    """
    from or4d_tpu.ops.box_geometry import box_corners, oriented_box_iou

    classes = sorted({c for preds in pred_by_scan.values() for (c, *_rest) in preds} | {c for gts in gt_by_scan.values() for (c, *_r) in gts})
    aps = {}
    for cls in classes:
        records = []  # (score, is_tp)
        n_gt = 0
        for scan, gts in gt_by_scan.items():
            cls_gts = [g for g in gts if g[0] == cls]
            n_gt += len(cls_gts)
            gt_corners = [box_corners(np.asarray(gc), np.asarray(gs), gh) for (_, gc, gs, gh) in cls_gts]
            used = np.zeros(len(cls_gts), bool)
            preds = sorted([p for p in pred_by_scan.get(scan, []) if p[0] == cls], key=lambda p: -p[4])
            for _, center, size, heading, score in preds:
                pc = box_corners(np.asarray(center), np.asarray(size), heading)
                best_iou, best_j = 0.0, -1
                for j, gc in enumerate(gt_corners):
                    iou, _ = oriented_box_iou(pc, gc)
                    if iou > best_iou:
                        best_iou, best_j = iou, j
                tp = best_iou >= iou_threshold and best_j >= 0 and not used[best_j]
                if tp:
                    used[best_j] = True
                records.append((score, tp))
        if n_gt == 0:
            continue
        records.sort(key=lambda r: -r[0])
        tps = np.cumsum([r[1] for r in records]) if records else np.array([])
        fps = np.cumsum([not r[1] for r in records]) if records else np.array([])
        recall = tps / n_gt if len(tps) else np.array([0.0])
        precision = tps / np.maximum(tps + fps, 1e-9) if len(tps) else np.array([0.0])
        # VOC-style interpolated AP
        mrec = np.concatenate([[0.0], recall, [1.0]])
        mpre = np.concatenate([[0.0], precision, [0.0]])
        for k in range(len(mpre) - 2, -1, -1):
            mpre[k] = max(mpre[k], mpre[k + 1])
        idx = np.where(mrec[1:] != mrec[:-1])[0]
        aps[cls] = float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))
    return aps
