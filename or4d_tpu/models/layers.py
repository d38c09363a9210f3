"""Shared building blocks: masked batch norm, MLP stacks.

The reference normalizes over ragged batch-of-1-scene tensors
(`build_shared_mlp` pointnet2_modules.py:9-19, `build_mlp`
network_TripletGCN.py:11-27). With padded static shapes, plain BatchNorm
would fold garbage slots into the statistics, so every norm here takes a
validity mask and computes masked moments. Torch semantics are preserved:
biased variance for normalization, unbiased for the running update,
``running = (1 - momentum) * running + momentum * batch``.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all non-channel axes with row validity masking.

    ``track_running_stats=False`` (TripletGCN's BN) -> always batch stats.
    Otherwise running stats are updated in the 'batch_stats' collection during
    training and used for normalization in eval (torch BatchNorm semantics).
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    track_running_stats: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None, train: bool = True, packed: int = 1) -> jax.Array:
        # x: (..., C); mask broadcastable to x[..., 0].
        #
        # packed > 1: x is (..., packed*C) with ``packed`` logical rows
        # side by side in the lane axis ((M, C) -> (M/packed, packed*C)
        # row-major packing — full 128-lane tiles for C < 128). Parameters
        # and running stats stay (C,); lane statistics are folded across the
        # ``packed`` groups, which is the same multiset of entries per
        # channel (reassociation only). Requires the mask to be uniform
        # across the packed axis (per-cloud row masks are).
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if mask is None:
            m = jnp.ones(x.shape[:-1], dtype=jnp.float32)
        else:
            m = jnp.broadcast_to(mask.astype(jnp.float32), x.shape[:-1])
        m = m[..., None]
        count = jnp.maximum(jnp.sum(m) * packed, 1.0)
        xf = x.astype(jnp.float32)
        red = tuple(range(x.ndim - 1))

        def _fold(lane_sums):
            # (packed*C,) lane sums -> (C,) channel sums (tiny vector op)
            return lane_sums.reshape(packed, self.features).sum(0) if packed > 1 else lane_sums

        def _tile(v):
            return jnp.tile(v, packed) if packed > 1 else v

        mean = _fold(jnp.sum(xf * m, axis=red)) / count
        var = _fold(jnp.sum(((xf - _tile(mean)) ** 2) * m, axis=red)) / count

        if self.track_running_stats:
            ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(self.features))
            ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(self.features))
            if train:
                if not self.is_initializing():
                    unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                    ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                    ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
            else:
                mean, var = ra_mean.value, ra_var.value

        y = (xf - _tile(mean)) * jax.lax.rsqrt(_tile(var) + self.eps)
        return (y * _tile(scale) + _tile(bias)).astype(x.dtype)


class SharedMLP(nn.Module):
    """The pointnet2 per-point MLP: 1x1 conv -> BN -> ReLU per layer
    (reference build_shared_mlp, pointnet2_modules.py:9-19). Channel-last:
    each layer is a Dense over the trailing channel axis, landing on the MXU.
    Conv bias is omitted when BN follows (reference `bias=not bn`)."""

    channels: Sequence[int]
    use_bn: bool = True
    dtype: object = jnp.float32  # bf16 puts the Dense matmuls on the MXU fast path

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None, train: bool = True) -> jax.Array:
        for i, ch in enumerate(self.channels):
            x = nn.Dense(ch, use_bias=not self.use_bn, dtype=self.dtype, name=f"dense_{i}")(x)
            if self.use_bn:
                x = MaskedBatchNorm(ch, name=f"bn_{i}")(x, mask=mask, train=train)
            x = nn.relu(x)
        return x


class MLP(nn.Module):
    """The TripletGCN `build_mlp` (network_TripletGCN.py:11-27): Linear
    (+bias) -> optional BN (track_running_stats=False) -> ReLU, with
    activation/norm skipped on the final layer unless ``on_last``."""

    dims: Sequence[int]  # output dims per layer
    do_bn: bool = True
    on_last: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None, train: bool = True) -> jax.Array:
        n = len(self.dims)
        for i, ch in enumerate(self.dims):
            x = nn.Dense(ch, name=f"dense_{i}")(x)
            final = i == n - 1
            if not final or self.on_last:
                if self.do_bn:
                    x = MaskedBatchNorm(ch, track_running_stats=False, name=f"bn_{i}")(x, mask=mask, train=train)
                x = nn.relu(x)
        return x
