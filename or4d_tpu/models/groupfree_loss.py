"""Group-Free 3D detection losses — TPU-native.

Reference: `external_src/group_free_3D/models/{loss_helper,losses}.py`:
  * KPS hard-topk seed objectness (compute_points_obj_cls_loss_hard_topk
    :9-71): per GT box, the topk seeds closest (size-normalized) among seeds
    belonging to that instance are positives; sigmoid focal loss
    (gamma 2, alpha 0.25), per-batch-row weight normalization;
  * per-layer candidate objectness: a candidate is positive iff its seed
    point lies on an object (point_obj_mask gather chain :73-131);
  * per-layer box losses (compute_box_and_sem_cls_loss :132+): smooth-L1
    center to the assigned GT (assignment = the candidate seed's instance
    id), CE heading class + smooth-L1 normalized heading residual under the
    GT bin one-hot, CE size class + smooth-L1 normalized size residual, CE
    semantic class — all masked/normalized by the positive candidates;
  * total (get_loss :291+): query_points_generation_loss * 0.8 +
    sum over layers of (objectness 0.1 + box + 0.1 * sem).

All ops are fixed-shape gathers/one-hots — directly jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from or4d_tpu.models.groupfree import NUM_HEADING_BIN


def smoothl1(error: jax.Array, delta: float = 1.0) -> jax.Array:
    d = jnp.abs(error)
    return jnp.where(d < delta, 0.5 * d * d / delta, d - 0.5 * delta)


def sigmoid_focal_loss(logits: jax.Array, targets: jax.Array, weights: jax.Array, gamma: float = 2.0, alpha: float = 0.25) -> jax.Array:
    """Per-element focal BCE (losses.py SigmoidFocalClassificationLoss)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    alpha_w = alpha * targets + (1 - alpha) * (1 - targets)
    pt = targets * (1 - p) + (1 - targets) * p
    return alpha_w * (pt**gamma) * ce * weights


def kps_objectness_loss(
    seed_xyz: jax.Array,  # (B, K, 3)
    seed_logits: jax.Array,  # (B, K)
    seed_instance: jax.Array,  # (B, K) instance id per seed, -1 background
    gt_center: jax.Array,  # (B, K2, 3)
    gt_size: jax.Array,  # (B, K2, 3)
    gt_mask: jax.Array,  # (B, K2) valid GT boxes
    topk: int = 5,
) -> jax.Array:
    """compute_points_obj_cls_loss_hard_topk."""
    B, K, _ = seed_xyz.shape
    K2 = gt_center.shape[1]
    assign = jnp.where(seed_instance < 0, K2 - 1, seed_instance)
    onehot = jax.nn.one_hot(assign, K2)  # (B, K, K2)
    delta = (seed_xyz[:, :, None, :] - gt_center[:, None, :, :]) / (gt_size[:, None, :, :] + 1e-6)
    dist = jnp.sqrt(jnp.sum(delta**2, axis=-1) + 1e-6)  # (B, K, K2)
    dist = dist * onehot + 100.0 * (1 - onehot)
    dist = jnp.swapaxes(dist, 1, 2)  # (B, K2, K)
    _, top_idx = jax.lax.top_k(-dist, topk)  # (B, K2, topk) closest seeds
    # positives: union over valid GT boxes of their topk seeds
    label = jnp.zeros((B, K))
    valid = gt_mask[:, :, None].astype(bool) & jnp.broadcast_to(jnp.ones((1, 1, topk), bool), (B, K2, topk))
    updates = valid.astype(jnp.float32)
    label = jax.vmap(lambda l, i, u: l.at[i.reshape(-1)].max(u.reshape(-1)))(label, top_idx, updates)
    label = jnp.where(seed_instance < 0, 0.0, label)

    w = jnp.ones((B, K)) / K
    loss = sigmoid_focal_loss(seed_logits, label, w)
    return jnp.sum(loss) / B


def layer_losses(
    head_out: dict,
    cand_instance: jax.Array,  # (B, P) instance id of each candidate's seed, -1 bg
    gt: dict,  # center (B,K2,3) size_class (B,K2) size_residual (B,K2,3)
    #           heading_class (B,K2) heading_residual (B,K2) sem_class (B,K2) mask (B,K2)
    mean_size_arr: np.ndarray,
) -> dict:
    """compute_objectness_loss_based_on_query_points + box/sem losses for ONE
    prediction head."""
    B, P = cand_instance.shape
    K2 = gt["center"].shape[1]
    pos = (cand_instance >= 0).astype(jnp.float32)  # objectness label
    assign = jnp.where(cand_instance < 0, K2 - 1, cand_instance)  # (B, P)

    # candidate objectness (focal, per-row normalized)
    w = jnp.ones((B, P)) / P
    obj_loss = jnp.sum(sigmoid_focal_loss(head_out["objectness"], pos, w)) / B

    take = lambda arr: jnp.take_along_axis(arr, assign, axis=1)
    take3 = lambda arr: jnp.take_along_axis(arr, assign[..., None], axis=1)
    denom = jnp.sum(pos) + 1e-6

    center_loss = jnp.sum(smoothl1(take3(gt["center"]) - head_out["center"]).sum(-1) * pos) / denom

    hc = take(gt["heading_class"])  # (B, P)
    hc_loss = jnp.sum(_ce(head_out["heading_scores"], hc) * pos) / denom
    hr_norm = take(gt["heading_residual"]) / (np.pi / NUM_HEADING_BIN)
    pred_hr_norm = jnp.take_along_axis(
        head_out["heading_residual"] / (np.pi / NUM_HEADING_BIN), hc[..., None], axis=-1
    )[..., 0]
    hr_loss = jnp.sum(smoothl1(pred_hr_norm - hr_norm) * pos) / denom

    sc = take(gt["size_class"])
    sc_loss = jnp.sum(_ce(head_out["size_scores"], sc) * pos) / denom
    msz = jnp.asarray(mean_size_arr)  # (C, 3)
    gt_sr_norm = take3(gt["size_residual"]) / msz[sc]
    pred_sr = jnp.take_along_axis(
        head_out["size_residual"], sc[..., None, None].repeat(3, -1), axis=-2
    )[..., 0, :] / msz[sc]
    sr_loss = jnp.sum(smoothl1(pred_sr - gt_sr_norm).sum(-1) * pos) / denom

    sem_loss = jnp.sum(_ce(head_out["sem_scores"], take(gt["sem_class"])) * pos) / denom

    box_loss = center_loss + 0.1 * hc_loss + hr_loss + 0.1 * sc_loss + sr_loss
    return {
        "objectness": obj_loss,
        "center": center_loss,
        "box": box_loss,
        "sem": sem_loss,
    }


def _ce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return -jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1), labels[..., None], axis=-1)[..., 0]


def groupfree_total_loss(
    outputs: dict,
    seed_instance: jax.Array,  # (B, num_seed)
    gt: dict,
    mean_size_arr: np.ndarray,
    seed_xyz: jax.Array,
    topk: int = 5,
    query_points_weight: float = 0.8,
    obj_weight: float = 0.1,
    box_weight: float = 1.0,
    sem_weight: float = 0.1,
):
    """get_loss: KPS seed loss + per-head (proposal + decoder layers)."""
    kps = kps_objectness_loss(
        seed_xyz,
        outputs["seeds_obj_cls_logits"],
        seed_instance,
        gt["center"],
        gt["size"],
        gt["mask"],
        topk=topk,
    )
    cand_instance = jnp.take_along_axis(seed_instance, outputs["sample_inds"], axis=1)
    total = query_points_weight * kps
    parts = {"kps": kps}
    heads = [("proposal", outputs["proposal"])] + [(f"head_{i}", h) for i, h in enumerate(outputs["layers"])]
    for name, head in heads:
        ls = layer_losses(head, cand_instance, gt, mean_size_arr)
        total = total + obj_weight * ls["objectness"] + box_weight * ls["box"] + sem_weight * ls["sem"]
        parts[name] = ls
    parts["total"] = total
    return total, parts
