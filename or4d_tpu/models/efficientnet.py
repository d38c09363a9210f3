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


def sgpn_trainable_labels(params: Any) -> Any:
    """'train'/'freeze' labels for the FULL SGPN param tree (optax
    multi_transform): everything outside the image branch trains; inside it
    only conv_head and the reduction do — the reference freezes the trunk
    every forward including BN affine params
    (scene_graph_prediction_model.py:49-57, freeze_image_model_batchnorm)."""

    def walk(tree, in_image, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, in_image or k == "image_branch", path + (k,)) for k, v in tree.items()}
        trainable = (not in_image) or any(p in ("conv_head", "reduction") for p in path)
        return "train" if trainable else "freeze"

    return walk(params, False)


def timm_parameter_mapping():
    """Enumerate the complete timm `tf_efficientnet_b5_ns` -> flax-trunk name
    map as tuples ``(timm_key, collection, flax_path, kind)``.

    timm module layout (timm/models/efficientnet.py): `conv_stem`/`bn1`,
    `blocks.{stage}.{rep}` where stage 0 is a DepthwiseSeparableConv
    (conv_dw, bn1, se, conv_pw, bn2) and stages 1-6 are InvertedResiduals
    (conv_pw, bn1, conv_dw, bn2, se, conv_pwl, bn3), then `conv_head`/`bn2`.
    `num_classes=0` (model_utils.py:10) means no classifier keys exist.

    kind: 'conv' = OIHW -> HWIO transpose (covers depthwise too: torch
    (C,1,k,k) -> flax (k,k,1,C) under feature_group_count); 'vec' = 1-d copy.
    """
    def bn(timm_name, flax_name, under):
        yield f"{timm_name}.weight", "params", under + (flax_name, "scale"), "vec"
        yield f"{timm_name}.bias", "params", under + (flax_name, "bias"), "vec"
        yield f"{timm_name}.running_mean", "batch_stats", under + (flax_name, "mean"), "vec"
        yield f"{timm_name}.running_var", "batch_stats", under + (flax_name, "var"), "vec"

    T = ("trunk",)
    yield "conv_stem.weight", "params", T + ("conv_stem", "kernel"), "conv"
    yield from bn("bn1", "bn_stem", T)
    for bi, (expand, _ch, reps, _stride, _k) in enumerate(_BASE):
        for ri in range(_round_repeats(reps, _B5_DEPTH)):
            t = f"blocks.{bi}.{ri}"
            B = T + (f"block{bi}_{ri}",)
            if expand == 1:
                # DepthwiseSeparableConv: its conv_pw is the projection,
                # landing on the flax block's conv_pwl/bn3 slots
                yield f"{t}.conv_dw.weight", "params", B + ("conv_dw", "kernel"), "conv"
                yield from bn(f"{t}.bn1", "bn2", B)
                proj, proj_bn = "conv_pw", f"{t}.bn2"
            else:
                yield f"{t}.conv_pw.weight", "params", B + ("conv_pw", "kernel"), "conv"
                yield from bn(f"{t}.bn1", "bn1", B)
                yield f"{t}.conv_dw.weight", "params", B + ("conv_dw", "kernel"), "conv"
                yield from bn(f"{t}.bn2", "bn2", B)
                proj, proj_bn = "conv_pwl", f"{t}.bn3"
            yield f"{t}.se.conv_reduce.weight", "params", B + ("se", "reduce", "kernel"), "conv"
            yield f"{t}.se.conv_reduce.bias", "params", B + ("se", "reduce", "bias"), "vec"
            yield f"{t}.se.conv_expand.weight", "params", B + ("se", "expand", "kernel"), "conv"
            yield f"{t}.se.conv_expand.bias", "params", B + ("se", "expand", "bias"), "vec"
            yield f"{t}.{proj}.weight", "params", B + ("conv_pwl", "kernel"), "conv"
            yield from bn(proj_bn, "bn3", B)
    yield "conv_head.weight", "params", T + ("conv_head", "kernel"), "conv"
    yield from bn("bn2", "bn_head", T)


def load_torch_efficientnet(state_dict: dict, variables: dict) -> dict:
    """Import a timm tf_efficientnet_b5_ns state_dict into the trunk's flax
    variables (paper-weight parity path, SURVEY.md §5).

    ``variables`` holds the trunk's {'params', 'batch_stats'} trees (either
    the bare :class:`EfficientNetB5` variables or any tree whose
    'trunk' subtree is it). Every trunk tensor must be covered — missing or
    shape-mismatched keys raise, so a partial import can't silently ship.
    Non-trunk keys in the state_dict (e.g. nothing for num_classes=0) are
    rejected unless ``num_batches_tracked`` bookkeeping.
    """
    import numpy as np

    out = {c: jax.tree_util.tree_map(lambda x: x, variables.get(c, {})) for c in ("params", "batch_stats")}

    def put(collection, path, value):
        node = out[collection]
        if "trunk" not in node and path and path[0] == "trunk":
            path = path[1:]  # variables passed for the bare trunk module
        for p in path[:-1]:
            node = node[p]
        expected = np.asarray(node[path[-1]])
        if value.shape != expected.shape:
            raise ValueError(f"shape mismatch at {'/'.join(path)}: {value.shape} vs {expected.shape}")
        node[path[-1]] = jnp.asarray(value, expected.dtype)

    consumed = set()
    for timm_key, collection, path, kind in timm_parameter_mapping():
        if timm_key not in state_dict:
            raise KeyError(f"state_dict missing {timm_key}")
        a = np.asarray(state_dict[timm_key])
        if kind == "conv":
            a = a.transpose(2, 3, 1, 0)
        put(collection, path, a)
        consumed.add(timm_key)
    extra = [k for k in state_dict if k not in consumed and not k.endswith("num_batches_tracked")]
    if extra:
        raise KeyError(f"unmapped state_dict keys: {extra[:5]}{'...' if len(extra) > 5 else ''}")
    return out
