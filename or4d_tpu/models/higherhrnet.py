"""HigherHRNet — bottom-up 2D multi-person pose estimation, TPU-native.

Reference: `external_src/HigherHRNet/` (HRNet-W32 trunk,
`higherhrnet_lib/models/pose_higher_hrnet.py`; 14 joints for 4D-OR; heatmap
grouping/aggregation in `core/group.py`, `core/inference.py`; inference
driver `tools/calculate_2d_human_pose.py` writing
`pred_or_4d_hrnet_coco_{split}.npz`).

Architecture (faithful, flax):
  * stem: two stride-2 3x3 convs to 64ch;
  * 4 stages of parallel multi-resolution branches (widths 32/64/128/256),
    each stage = residual basic blocks per branch + full multi-scale fusion
    (strided-conv down, 1x1 + upsample up);
  * head 1 (1/4 resolution): 1x1 conv -> num_joints heatmaps + num_joints
    associative-embedding tags;
  * head 2 (1/2 resolution, the "higher" branch): deconv block on
    [features | head-1 output] -> basic blocks -> num_joints heatmaps;
  * inference: heatmap aggregation across the two resolutions + AE grouping
    (top-k peaks per joint, greedy tag matching) — host-side numpy, as in
    the reference's cpu post-processing.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

NUM_JOINTS = 14
WIDTHS = (32, 64, 128, 256)


class BasicBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train=True):
        r = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False, name="conv1")(x)
        r = nn.BatchNorm(use_running_average=not train, name="bn1")(r)
        r = nn.relu(r)
        r = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False, name="conv2")(r)
        r = nn.BatchNorm(use_running_average=not train, name="bn2")(r)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), use_bias=False, name="down_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, name="down_bn")(x)
        return nn.relu(r + x)


class Bottleneck(nn.Module):
    features: int  # output = features * 4

    @nn.compact
    def __call__(self, x, train=True):
        out = self.features * 4
        r = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        r = nn.BatchNorm(use_running_average=not train, name="bn1")(r)
        r = nn.relu(r)
        r = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False, name="conv2")(r)
        r = nn.BatchNorm(use_running_average=not train, name="bn2")(r)
        r = nn.relu(r)
        r = nn.Conv(out, (1, 1), use_bias=False, name="conv3")(r)
        r = nn.BatchNorm(use_running_average=not train, name="bn3")(r)
        if x.shape[-1] != out:
            x = nn.Conv(out, (1, 1), use_bias=False, name="down_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, name="down_bn")(x)
        return nn.relu(r + x)


def _upsample(x, factor):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H * factor, W * factor, C), method="nearest")


class FuseLayer(nn.Module):
    """Full multi-scale fusion across branches (HRNet exchange unit)."""

    widths: tuple[int, ...]

    @nn.compact
    def __call__(self, xs, train=True):
        n = len(xs)
        outs = []
        for i in range(n):
            acc = None
            for j in range(n):
                y = xs[j]
                if j > i:  # upsample lower-res branch
                    y = nn.Conv(self.widths[i], (1, 1), use_bias=False, name=f"up_{i}_{j}_conv")(y)
                    y = nn.BatchNorm(use_running_average=not train, name=f"up_{i}_{j}_bn")(y)
                    y = _upsample(y, 2 ** (j - i))
                elif j < i:  # downsample higher-res branch with strided convs
                    for k in range(i - j):
                        last = k == i - j - 1
                        w = self.widths[i] if last else self.widths[j]
                        y = nn.Conv(w, (3, 3), strides=2, padding="SAME", use_bias=False, name=f"dn_{i}_{j}_{k}_conv")(y)
                        y = nn.BatchNorm(use_running_average=not train, name=f"dn_{i}_{j}_{k}_bn")(y)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class Stage(nn.Module):
    widths: tuple[int, ...]
    blocks: int = 4

    @nn.compact
    def __call__(self, xs, train=True):
        ys = []
        for bi, x in enumerate(xs):
            for l in range(self.blocks):
                x = BasicBlock(self.widths[bi], name=f"branch{bi}_block{l}")(x, train)
            ys.append(x)
        return FuseLayer(self.widths[: len(xs)], name="fuse")(ys, train)


class HigherHRNet(nn.Module):
    num_joints: int = NUM_JOINTS
    with_tags: bool = True

    @nn.compact
    def __call__(self, images, train=True):
        """images (B, H, W, 3) -> (hm_low (B,H/4,W/4,J(+J tags)),
        hm_high (B,H/2,W/2,J))."""
        x = nn.Conv(64, (3, 3), strides=2, padding="SAME", use_bias=False, name="stem1")(images)
        x = nn.BatchNorm(use_running_average=not train, name="stem1_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), strides=2, padding="SAME", use_bias=False, name="stem2")(x)
        x = nn.BatchNorm(use_running_average=not train, name="stem2_bn")(x)
        x = nn.relu(x)
        for l in range(4):
            x = Bottleneck(64, name=f"layer1_{l}")(x, train)

        # transition to 2 branches
        b0 = nn.relu(nn.BatchNorm(use_running_average=not train, name="t1_bn0")(
            nn.Conv(WIDTHS[0], (3, 3), padding="SAME", use_bias=False, name="t1_conv0")(x)))
        b1 = nn.relu(nn.BatchNorm(use_running_average=not train, name="t1_bn1")(
            nn.Conv(WIDTHS[1], (3, 3), strides=2, padding="SAME", use_bias=False, name="t1_conv1")(x)))
        xs = [b0, b1]
        xs = Stage(WIDTHS, name="stage2")(xs, train)

        b2 = nn.relu(nn.BatchNorm(use_running_average=not train, name="t2_bn")(
            nn.Conv(WIDTHS[2], (3, 3), strides=2, padding="SAME", use_bias=False, name="t2_conv")(xs[-1])))
        xs = xs + [b2]
        for rep in range(4):
            xs = Stage(WIDTHS, name=f"stage3_{rep}")(xs, train)

        b3 = nn.relu(nn.BatchNorm(use_running_average=not train, name="t3_bn")(
            nn.Conv(WIDTHS[3], (3, 3), strides=2, padding="SAME", use_bias=False, name="t3_conv")(xs[-1])))
        xs = xs + [b3]
        for rep in range(3):
            xs = Stage(WIDTHS, name=f"stage4_{rep}")(xs, train)

        feat = xs[0]  # (B, H/4, W/4, 32)
        out_ch = self.num_joints * (2 if self.with_tags else 1)
        low = nn.Conv(out_ch, (1, 1), name="final_low")(feat)

        # higher-resolution branch: deconv on [feat | low] then refine
        cat = jnp.concatenate([feat, low], axis=-1)
        up = nn.ConvTranspose(WIDTHS[0], (4, 4), strides=(2, 2), use_bias=False, name="deconv")(cat)
        up = nn.BatchNorm(use_running_average=not train, name="deconv_bn")(up)
        up = nn.relu(up)
        for l in range(4):
            up = BasicBlock(WIDTHS[0], name=f"refine_{l}")(up, train)
        high = nn.Conv(self.num_joints, (1, 1), name="final_high")(up)
        return low, high


# ---------------------------------------------------------------------------
# training losses: heatmap MSE + associative-embedding pull/push
# (reference: HigherHRNet core/loss.py — HeatmapLoss and AELoss)
# ---------------------------------------------------------------------------

def heatmap_loss(pred: jax.Array, gt: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Per-pixel MSE against gaussian-rendered GT heatmaps; optional valid
    mask (the reference masks crowd regions)."""
    d = (pred - gt) ** 2
    if mask is not None:
        d = d * mask[..., None]
    return jnp.mean(d)


def ae_loss(tags: jax.Array, joint_pos: jax.Array, joint_valid: jax.Array, pull_weight: float = 1.0, push_weight: float = 1.0):
    """Associative-embedding grouping loss (Newell et al.; core/loss.py AELoss).

    ``tags``: (H, W, J) predicted tag maps; ``joint_pos``: (P, J, 2) int GT
    pixel positions per person; ``joint_valid``: (P, J) bool. Pull: each
    person's joint tags toward their mean; push: person means apart
    (exp(-d^2) penalty). Static shapes: invalid people/joints masked.
    """
    P, J, _ = joint_pos.shape
    xs = jnp.clip(joint_pos[..., 0], 0, tags.shape[1] - 1)
    ys = jnp.clip(joint_pos[..., 1], 0, tags.shape[0] - 1)
    jidx = jnp.broadcast_to(jnp.arange(J)[None, :], (P, J))
    per_joint_tags = tags[ys, xs, jidx]  # (P, J)
    v = joint_valid.astype(jnp.float32)
    counts = jnp.maximum(v.sum(axis=1), 1.0)
    means = (per_joint_tags * v).sum(axis=1) / counts  # (P,)
    pull = jnp.sum(((per_joint_tags - means[:, None]) ** 2) * v) / jnp.maximum(v.sum(), 1.0)

    person_valid = (v.sum(axis=1) > 0).astype(jnp.float32)
    diff = means[:, None] - means[None, :]
    pv = person_valid[:, None] * person_valid[None, :] * (1.0 - jnp.eye(P))
    push = jnp.sum(jnp.exp(-(diff**2)) * pv) / jnp.maximum(pv.sum(), 1.0)
    return pull_weight * pull + push_weight * push, {"pull": pull, "push": push}


def render_gt_heatmaps(joint_pos: jax.Array, joint_valid: jax.Array, shape: tuple[int, int], sigma: float = 2.0) -> jax.Array:
    """GT gaussian heatmaps (H, W, J) from (P, J, 2) pixel positions."""
    H, W = shape
    P, J, _ = joint_pos.shape
    yy = jnp.arange(H)[:, None, None, None]
    xx = jnp.arange(W)[None, :, None, None]
    d2 = (xx - joint_pos[None, None, :, :, 0]) ** 2 + (yy - joint_pos[None, None, :, :, 1]) ** 2
    g = jnp.exp(-d2 / (2 * sigma**2)) * joint_valid[None, None].astype(jnp.float32)
    return jnp.max(g, axis=2)  # max over people -> (H, W, J)


# ---------------------------------------------------------------------------
# heatmap aggregation + associative-embedding grouping (core/group.py)
# ---------------------------------------------------------------------------

def aggregate_heatmaps(low: np.ndarray, high: np.ndarray) -> np.ndarray:
    """Average the 1/4-res heatmaps (upsampled) with the 1/2-res ones
    (core/inference.py aggregation). Inputs channel-last; returns (H, W, J)."""
    J = high.shape[-1]
    low_hm = low[..., :J]
    low_up = np.asarray(jax.image.resize(jnp.asarray(low_hm), high.shape[:-1] + (J,), "bilinear"))
    return (low_up + high) / 2.0


def group_people_by_tags(
    heatmaps: np.ndarray,  # (H, W, J) aggregated
    tags: np.ndarray,  # (Ht, Wt, J) embedding tags (1/4 res, upsampled by caller)
    max_people: int = 10,
    detection_threshold: float = 0.1,
    tag_threshold: float = 1.0,
) -> list[np.ndarray]:
    """Greedy associative-embedding grouping (core/group.py semantics):
    per joint, take top-k peaks; assign each peak to the person whose mean
    tag is closest (within tag_threshold), else start a new person.
    Returns a list of (J, 3) arrays [x, y, score] (0 score = missing)."""
    H, W, J = heatmaps.shape
    people: list[dict] = []
    for j in range(J):
        hm = heatmaps[:, :, j]
        flat = hm.reshape(-1)
        top = np.argsort(-flat)[:max_people]
        for idx in top:
            score = flat[idx]
            if score < detection_threshold:
                break
            y, x = divmod(int(idx), W)
            tag = tags[min(y, tags.shape[0] - 1), min(x, tags.shape[1] - 1), j]
            best, best_d = None, tag_threshold
            for p in people:
                if p["joints"][j, 2] > 0:
                    continue  # one peak per joint per person
                d = abs(p["tag_sum"] / p["count"] - tag)
                if d < best_d:
                    best, best_d = p, d
            if best is None:
                if len(people) >= max_people:
                    continue
                best = {"joints": np.zeros((J, 3)), "tag_sum": 0.0, "count": 0}
                people.append(best)
            best["joints"][j] = (x, y, score)
            best["tag_sum"] += tag
            best["count"] += 1
    return [p["joints"] for p in people if (p["joints"][:, 2] > 0).sum() >= 3]
