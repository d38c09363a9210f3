"""PointNet++ MSG feature encoder — TPU-native.

Architecture mirrors the reference "max we can run" config
(`pointnet2/models/pointnet2_msg_cls.py:45-78` + SSG base
`pointnet2_ssg_cls.py:98-124` + SA modules `pointnet2_modules.py:29-115`):

  SA1 (npoint 512): scales (r=0.1, ns=16, mlp [C, 64, 64]),
                            (r=0.2, ns=32, mlp [C, 64, 128])
  SA2 (npoint 128): scales (r=0.2, ns=32, mlp [195, 128, 128]),
                            (r=0.4, ns=64, mlp [195, 128, 128])
  SA3 (global):     mlp [259, 256, 256]

with use_xyz=True (the +3 on every first mlp width). Output: a 256-d global
feature per cloud ("return_features=True" path, network_PointNet2.py:21-25).

TPU design: channel-last layout throughout, so every MLP layer is one big
Dense over (B*npoint*nsample, C) riding the MXU; the ball-query/grouping
gathers come from :mod:`or4d_tpu.ops`; FPS uses the fused Pallas kernel.
A row mask (valid objects/edges of padded scenes) threads into every
BatchNorm so padding never pollutes statistics.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from or4d_tpu import ops
from or4d_tpu.models.layers import MaskedBatchNorm, SharedMLP


@dataclasses.dataclass(frozen=True)
class SAScale:
    radius: float
    nsample: int
    mlp: tuple[int, ...]  # hidden widths AFTER the input (input width inferred)


class DelayedSharedMLP(nn.Module):
    """SharedMLP for grouped neighborhoods with DELAYED AGGREGATION.

    The first grouped conv layer is separable because its input is
    [p - q | f_p] and the SA MLPs are bias-free (BN follows every conv):

        W @ [p - q, f_p] = W @ [p, f_p] - W_xyz @ q

    so layer 1 is computed once per SUPPORT point (N evaluations instead of
    npoint*nsample overlapping ones — the Mesorasi delayed-aggregation
    insight), the gather moves layer-1 outputs instead of raw channels, the
    per-query term is subtracted post-gather, and BN/ReLU + the remaining
    layers proceed on the grouped tensor. Exact up to float reassociation.

    Parameter names/shapes mirror SharedMLP (dense_i/bn_i), so checkpoint
    import is unchanged.
    """

    channels: Sequence[int]
    radius: float = 0.0
    nsample: int = 0
    fused: bool = False  # fused Pallas ball-query+group (TPU)
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, xyz, features, new_xyz, qidx=None, mask=None, train: bool = True):
        support_in = (
            jnp.concatenate([xyz, features], axis=-1) if features is not None else xyz
        ).astype(self.dtype)
        dense0 = nn.Dense(self.channels[0], use_bias=False, dtype=self.dtype, name="dense_0")
        A = dense0(support_in)  # (B, N, C1): W @ [p, f_p]
        pad_q = jnp.concatenate(
            [new_xyz.astype(self.dtype), jnp.zeros(new_xyz.shape[:-1] + (support_in.shape[-1] - 3,), self.dtype)],
            axis=-1,
        )
        Bq = dense0(pad_q)  # (B, M, C1): W_xyz @ q (zero feature channels)

        if self.fused:
            # one Pallas kernel: distances + first-k selection emit the
            # grouped layer-1 features directly via one-hot MXU selection —
            # no index tensors, no HBM gathers
            from or4d_tpu.ops.pallas_ball_query import ball_query_group_pallas

            gathered = ball_query_group_pallas(
                ((float(self.radius), int(self.nsample)),), xyz, new_xyz, (A,)
            )[0]
        else:
            gathered = jnp.take_along_axis(A[:, :, None, :], qidx[..., None], axis=1)  # (B, M, S, C1)
        h = gathered - Bq[:, :, None, :]
        m = _expand_mask(mask, h)
        h = MaskedBatchNorm(self.channels[0], name="bn_0")(h, mask=m, train=train)
        h = nn.relu(h)
        for i, ch in enumerate(self.channels[1:], start=1):
            h = nn.Dense(ch, use_bias=False, dtype=self.dtype, name=f"dense_{i}")(h)
            h = MaskedBatchNorm(ch, name=f"bn_{i}")(h, mask=m, train=train)
            h = nn.relu(h)
        return h


class SetAbstractionMSG(nn.Module):
    """Multi-scale grouping set abstraction (PointnetSAModuleMSG).

    Input: xyz (B, N, 3), features (B, N, C) channel-last (or None).
    Output: new_xyz (B, npoint, 3), features (B, npoint, sum(scale outs)).
    """

    npoint: int
    scales: Sequence[SAScale]
    use_xyz: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, xyz, features, mask=None, train: bool = True):
        from or4d_tpu.ops.pallas_ball_query import ball_query_multiscale

        idx = ops.furthest_point_sample(xyz, self.npoint)
        idx = jax.lax.stop_gradient(idx)
        new_xyz = jnp.take_along_axis(xyz, idx[..., None], axis=1)  # (B, npoint, 3)

        fused = jax.default_backend() == "tpu"
        scale_idx = None
        if not fused:
            # XLA fallback: one fused distance pass serves every scale
            scale_idx = ball_query_multiscale(
                tuple((sc.radius, sc.nsample) for sc in self.scales), xyz, new_xyz
            )
        outs = []
        for si, sc in enumerate(self.scales):
            qidx = None if fused else jax.lax.stop_gradient(scale_idx[si])
            h = DelayedSharedMLP(
                sc.mlp, radius=sc.radius, nsample=sc.nsample, fused=fused, dtype=self.dtype, name=f"mlp_{si}"
            )(xyz, features, new_xyz, qidx, mask=mask, train=train)
            outs.append(jnp.max(h, axis=2))  # maxpool over nsample -> (B, npoint, C_out)
        return new_xyz, jnp.concatenate(outs, axis=-1)


class SetAbstractionAll(nn.Module):
    """Global set abstraction (PointnetSAModule with npoint=None/GroupAll)."""

    mlp: tuple[int, ...]
    use_xyz: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, xyz, features, mask=None, train: bool = True):
        x = jnp.concatenate([xyz.astype(features.dtype), features], axis=-1) if self.use_xyz else features
        h = SharedMLP(self.mlp, dtype=self.dtype, name="mlp")(x.astype(self.dtype), mask=_expand_mask(mask, x), train=train)
        return None, jnp.max(h, axis=1)  # (B, C_out)


def _expand_mask(mask, x):
    """Broadcast a per-row (B,) mask across the point axes of x (..., C)."""
    if mask is None:
        return None
    return mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim - 1))


class PointNet2MSGEncoder(nn.Module):
    """The reference PointNetfeat2: MSG backbone as a global feature extractor.

    Input: point clouds (B, P, input_dim) channel-last, xyz first 3 channels.
    Output: (B, out_size) global features (out_size=256 for the paper config).
    """

    input_dim: int = 6
    out_size: int = 256
    # (SA1, SA2) centroid counts; reference values 512/128. Scaled down only
    # for cheap CI shapes — the architecture is otherwise identical.
    sa_npoints: tuple[int, int] = (512, 128)
    # ball-query sample counts per scale; reference (16, 32) and (32, 64)
    sa_nsamples: tuple[tuple[int, int], tuple[int, int]] = ((16, 32), (32, 64))
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, pc, mask=None, train: bool = True):
        xyz = pc[..., 0:3].astype(jnp.float32)  # geometry stays f32 (FPS/query exactness)
        features = pc[..., 3:] if pc.shape[-1] > 3 else None

        xyz, features = SetAbstractionMSG(
            npoint=self.sa_npoints[0],
            scales=(
                SAScale(0.1, self.sa_nsamples[0][0], (64, 64)),
                SAScale(0.2, self.sa_nsamples[0][1], (64, 128)),
            ),
            dtype=self.dtype,
            name="sa1",
        )(xyz, features, mask=mask, train=train)
        xyz, features = SetAbstractionMSG(
            npoint=self.sa_npoints[1],
            scales=(
                SAScale(0.2, self.sa_nsamples[1][0], (128, 128)),
                SAScale(0.4, self.sa_nsamples[1][1], (128, 128)),
            ),
            dtype=self.dtype,
            name="sa2",
        )(xyz, features, mask=mask, train=train)
        _, features = SetAbstractionAll(mlp=(256, self.out_size), dtype=self.dtype, name="sa3")(
            xyz, features, mask=mask, train=train
        )
        return features
