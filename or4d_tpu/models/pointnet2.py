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

        # one fused distance pass serves every scale's ball query
        scale_idx = ball_query_multiscale(
            tuple((sc.radius, sc.nsample) for sc in self.scales), xyz, new_xyz
        )
        # gathers are latency-bound per row, so widening a row is ~free:
        # narrow features fuse [xyz | feats] into ONE gather; wide features
        # (later SA stages) keep a separate gather from a compute-dtype cast
        # so the grouped temporaries don't blow HBM at batch scale
        C = 0 if features is None else features.shape[-1]
        fuse = features is not None and C <= 32
        if fuse:
            src = jnp.concatenate([xyz, features.astype(jnp.float32)], axis=-1)
        elif features is not None:
            feats_c = features.astype(self.dtype)

        outs = []
        for si, sc in enumerate(self.scales):
            qidx = jax.lax.stop_gradient(scale_idx[si])
            if fuse:
                g = jnp.take_along_axis(src[:, :, None, :], qidx[..., None], axis=1)
                rel_xyz = g[..., :3] - new_xyz[:, :, None, :]
                grouped = jnp.concatenate([rel_xyz, g[..., 3:]], axis=-1) if self.use_xyz else g[..., 3:]
            else:
                rel_xyz = (
                    jnp.take_along_axis(xyz[:, :, None, :], qidx[..., None], axis=1) - new_xyz[:, :, None, :]
                )
                if features is None:
                    grouped = rel_xyz
                else:
                    gf = jnp.take_along_axis(feats_c[:, :, None, :], qidx[..., None], axis=1)
                    grouped = (
                        jnp.concatenate([rel_xyz.astype(self.dtype), gf], axis=-1) if self.use_xyz else gf
                    )
            h = SharedMLP(sc.mlp, dtype=self.dtype, name=f"mlp_{si}")(
                grouped.astype(self.dtype), mask=_expand_mask(mask, grouped), train=train
            )
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
