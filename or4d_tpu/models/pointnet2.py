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


# Paper ball-query radii (pointnet2_msg_cls.py:45-78) — the single source for
# the encoder, the serving-cache geometry build (or4d_tpu/serving.py) and the
# attribution scripts; a second copy could silently desync cache neighborhoods
# from the ones the cold path computes.
SA1_RADII = (0.1, 0.2)
SA2_RADII = (0.2, 0.4)


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
    dtype: object = jnp.float32

    def setup(self):
        self.dense_layers = [
            nn.Dense(ch, use_bias=False, dtype=self.dtype, name=f"dense_{i}")
            for i, ch in enumerate(self.channels)
        ]
        self.bn_layers = [MaskedBatchNorm(ch, name=f"bn_{i}") for i, ch in enumerate(self.channels)]

    def w0_matrix(self, c0):
        """The layer-1 weight (c0, C1) recovered through the module (identity
        probe — parameter naming untouched), for kernels that compute the A
        plane in VMEM from raw [p|f] channels (v4 raw mode)."""
        return self.dense_layers[0](jnp.eye(c0, dtype=self.dtype))

    def bq_term(self, new_xyz, c0):
        """The per-query subtraction term Bq = W_xyz @ q alone (the delayed
        aggregation identity W @ [p-q, f] = W @ [p, f] - W @ [q, 0...])."""
        pad_q = jnp.concatenate(
            [new_xyz.astype(self.dtype), jnp.zeros(new_xyz.shape[:-1] + (c0 - 3,), self.dtype)],
            axis=-1,
        )
        return self.dense_layers[0](pad_q)

    def pre(self, xyz, features, new_xyz):
        """Per-support layer-1 plane A = W @ [p, f_p] and the per-query
        subtraction term Bq = W_xyz @ q."""
        support_in = (
            jnp.concatenate([xyz, features], axis=-1) if features is not None else xyz
        ).astype(self.dtype)
        A = self.dense_layers[0](support_in)  # (B, N, C1)
        pad_q = jnp.concatenate(
            [new_xyz.astype(self.dtype), jnp.zeros(new_xyz.shape[:-1] + (support_in.shape[-1] - 3,), self.dtype)],
            axis=-1,
        )
        Bq = self.dense_layers[0](pad_q)  # (B, M, C1)
        return A, Bq

    def post(self, gathered, Bq, mask=None, train: bool = True, slot_major: bool = False, packed: int = 1):
        """BN/ReLU + the remaining conv layers on the grouped tensor —
        (B, M, ns, C), or (B, ns, M, C) when ``slot_major`` (the gated train
        kernel's native layout; BN statistics are axis-order invariant).

        ``packed > 1`` (slot-major only): the lane groups are SLOT pairs —
        ``gathered`` is (B, ns/packed, M, packed*C), the gated kernel's
        pack_slots layout, so every chain tensor rides full 128-lane tiles
        (a C=64 plane otherwise wastes half its HBM tiles on lane padding).
        ``Bq`` stays (B, M, C) and tiles across the lane groups; BN folds
        lane statistics back per channel (same multiset); each conv applies
        blockdiag(W, ..., W) — exact up to float reassociation.

        (A query-row-folding variant of the lane packing — ``packed_chain``,
        (B, ns, M/p, p*C) with an XLA repack — measured −10% on-chip
        2026-08-18 and was deleted; the kernel-emitted slot-pair layout is
        the surviving form. PERF.md round-6/8.)"""
        if packed > 1:
            assert slot_major, "packed chain is defined for the slot-major layout"
            Bqp = jnp.concatenate([Bq] * packed, axis=-1)  # (B, M, packed*C)
            h = gathered - Bqp[:, None, :, :]
        else:
            h = gathered - (Bq[:, None, :, :] if slot_major else Bq[:, :, None, :])
        m = _expand_mask(mask, h)
        h = self.bn_layers[0](h, mask=m, train=train, packed=packed)
        h = nn.relu(h)
        for dense, bn in zip(self.dense_layers[1:], self.bn_layers[1:]):
            if packed > 1:
                # blockdiag apply keeps rows packed; W recovered through the
                # module (identity probe) so parameter naming is untouched
                cin = h.shape[-1] // packed
                W = dense(jnp.eye(cin, dtype=self.dtype))
                h = h.astype(self.dtype) @ jnp.kron(jnp.eye(packed, dtype=self.dtype), W)
            else:
                h = dense(h)
            h = bn(h, mask=m, train=train, packed=packed)
            h = nn.relu(h)
        return h

    def fused_eval_params(self):
        """(a0, b0, W1, a1, b1) for the fully fused inference kernel: the two
        eval-mode BNs folded to per-channel affines (recovered through probe
        evaluations of the BN modules themselves, so running stats and
        parameter naming stay untouched) and the second conv's kernel
        (recovered by applying it to the identity)."""
        assert len(self.channels) == 2, "fused eval path supports 2-layer SA MLPs"
        c1, c2 = self.channels
        z1 = jnp.zeros((1, c1), jnp.float32)
        b0 = self.bn_layers[0](z1, train=False)[0]
        a0 = self.bn_layers[0](z1 + 1.0, train=False)[0] - b0
        W1 = self.dense_layers[1](jnp.eye(c1, dtype=self.dtype))
        z2 = jnp.zeros((1, c2), jnp.float32)
        b1 = self.bn_layers[1](z2, train=False)[0]
        a1 = self.bn_layers[1](z2 + 1.0, train=False)[0] - b1
        return a0, b0, W1, a1, b1

    def from_grouped(self, grouped, new_xyz, mask=None, train: bool = True):
        """Serving path (or4d_tpu/serving.py): the same delayed-aggregation
        arithmetic on CACHED grouped ``[p_abs | f]`` planes —
        dense0(grouped) - dense0(pad(q)), i.e. the gather already happened at
        cache-build time and only weights-dependent matmuls run here."""
        A_g = self.dense_layers[0](grouped.astype(self.dtype))  # (B, M, ns, C1)
        pad_q = jnp.concatenate(
            [new_xyz.astype(self.dtype),
             jnp.zeros(new_xyz.shape[:-1] + (grouped.shape[-1] - 3,), self.dtype)],
            axis=-1,
        )
        Bq = self.dense_layers[0](pad_q)  # (B, M, C1)
        return self.post(A_g, Bq, mask=mask, train=train)

    def __call__(self, xyz, features, new_xyz, qidx=None, mask=None, train: bool = True):
        A, Bq = self.pre(xyz, features, new_xyz)
        gathered = jnp.take_along_axis(A[:, :, None, :], qidx[..., None], axis=1)  # (B, M, S, C1)
        return self.post(gathered, Bq, mask=mask, train=train)


class SetAbstractionMSG(nn.Module):
    """Multi-scale grouping set abstraction (PointnetSAModuleMSG).

    Input: xyz (B, N, 3), features (B, N, C) channel-last (or None).
    Output: new_xyz (B, npoint, 3), features (B, npoint, sum(scale outs)).
    """

    npoint: int
    scales: Sequence[SAScale]
    use_xyz: bool = True
    dtype: object = jnp.float32
    # "auto": Pallas kernels on TPU, index path elsewhere. Explicit modes
    # ("eval_kernel" / "train_kernel" / "index") exist for parity tests,
    # together with kernel_interpret for running the kernels off-TPU.
    fused_mode: str = "auto"
    kernel_interpret: bool = False
    # two-gate sub-tiling for the fused eval kernel (rows per gate group;
    # 0 = static unroll). Exact — see ball_query_group_mlp_pallas.
    eval_subtile: int = 32
    # packed_slots: the gated train kernel EMITS slot pairs lane-packed —
    # (B, ns/2, M, 2C) — so the C=64 chain rides full 128-lane tiles with NO
    # XLA relayout (the repack that sank packed_chain). Exact up to BN
    # reassociation; opt-in until measured on-chip.
    packed_slots: bool = False
    # run each eval scale through its OWN v4 kernel call with a solo-optimal
    # query sort: the shared two-scale composite order costs scale 1 ~55% of
    # ungated work vs its ~40% solo optimum (PERF.md round-3). d2 is already
    # per-scale in v4 (lazy in-loop), so splitting only re-pays the launch +
    # the second argsort. Exact (order never affects results); opt-in until
    # measured on-chip.
    per_scale_sort: bool = False
    # raw-mode TRAIN kernels (the eval v4 raw analogue): the gated train
    # kernel materializes the layer-1 A planes in VMEM from the channel-major
    # raw [p|f] plane, and its VJP accumulates dW0 = raw^T @ dA in-kernel —
    # the multi-GB A (fwd) and f32 dA (bwd) HBM planes never exist.
    # COTANGENT CONTRACT: features receive ZERO gradient through the kernel
    # (exact for parameter training only when features are MODEL INPUTS);
    # the encoder enables this for SA1 only — SA2+ features carry gradients
    # and must keep the non-raw path.
    train_raw: bool = False
    # run each TRAIN gated scale through its own kernel call with a
    # solo-optimal query sort (the eval per_scale_sort analogue — the shared
    # composite order costs scale 1 ~55% of ungated slot work vs ~40% solo,
    # PERF.md round-3/8; d2 tiles are already per-scale in the gated train
    # kernel, so splitting re-pays only the launch + the second argsort,
    # fwd AND bwd). Values identical up to BN-stat reassociation (a pure
    # per-scale permutation). Measured 2026-08-19 at the S=10 train
    # default: 12.83 vs 12.48 scenes/s — production default ON (TPUConfig).
    train_per_scale_sort: bool = False

    @staticmethod
    def _pad_pre_inputs(xyz, features):
        """Zero-pad the support axis to a _CHUNK multiple for `pre` so the
        layer-1 plane A is BORN at the eval kernels' padded width: padding A
        afterwards makes XLA materialize copy+pad HLO temps of the multi-GB
        plane (3x4.5G at S=64 — the 2026-08-18 HBM OOM). dense(0)=0 rows are
        exactly what the kernel pad wrote, and poison support coords keep
        them unselectable, so results are bit-identical. Only the `pre`
        input is padded — the kernel still receives the ORIGINAL xyz (its
        own pad uses far-away coords; zero-padded xyz would sit at the
        origin, inside zero-mean crops' query radius)."""
        from or4d_tpu.ops.pallas_ball_query import _CHUNK

        npad = (-xyz.shape[1]) % _CHUNK
        if npad == 0:
            return xyz, features
        xyz_p = jnp.pad(xyz, ((0, 0), (0, npad), (0, 0)))
        feat_p = None if features is None else jnp.pad(features, ((0, 0), (0, npad), (0, 0)))
        return xyz_p, feat_p

    def _v4_call(self, v4_fn, scale_spec, xyz, new_xyz, params, bounds, raw=None):
        """Dispatch the fused v4 eval kernel: one multi-scale call (shared
        composite sort), or one solo-sorted call per scale (per_scale_sort).
        ``raw``: channel-major [p|f] plane for in-kernel A materialization
        (params then carry layer-1 weights instead of A planes)."""
        if not self.per_scale_sort:
            return v4_fn(scale_spec, xyz, new_xyz, params, bounds,
                         self.kernel_interpret, None, self.eval_subtile, True, raw)
        return [
            v4_fn((scale_spec[si],), xyz, new_xyz, (params[si],), (bounds[si],),
                  self.kernel_interpret, None, self.eval_subtile, True, raw)[0]
            for si in range(len(scale_spec))
        ]

    @nn.compact
    def __call__(self, xyz, features, mask=None, train: bool = True, features_alt=None, cache=None):
        from or4d_tpu.ops.pallas_ball_query import (
            _CHUNK,
            _counts_to_bounds,
            ball_query_group_mlp_pallas,
            ball_query_group_mlp_pallas_v4,
            ball_query_group_pallas,
            ball_query_multiscale,
        )

        if cache is not None:
            # serving: FPS/ball query precomputed (or4d_tpu/serving.py) —
            # only the weights-dependent MLP chain runs
            mlps_c = [
                DelayedSharedMLP(sc.mlp, radius=sc.radius, nsample=sc.nsample,
                                 dtype=self.dtype, name=f"mlp_{si}")
                for si, sc in enumerate(self.scales)
            ]
            kernel_ok = (
                getattr(cache, "channel_major", False)
                and not train
                and all(len(sc.mlp) == 2 for sc in self.scales)
                and (jax.default_backend() == "tpu" or self.kernel_interpret)
            )
            if kernel_ok:
                # fused serving kernel: the whole bf16 chain + slot max in
                # VMEM off the slot-flattened channel-major planes (the XLA
                # from_grouped formulation materializes multi-GB
                # (B, M, ns, C) HBM intermediates — measured 129 of 215 ms
                # at S=64; a first row-major-layout kernel attempt measured
                # −26% and was deleted — ops/pallas_serving_mlp.py has the
                # layout story)
                from or4d_tpu.ops.pallas_serving_mlp import serving_sa1_mlp_pallas

                outs = [
                    serving_sa1_mlp_pallas(
                        g, m.bq_term(cache.new_xyz, cache.c0), m.w0_matrix(cache.c0),
                        *m.fused_eval_params(), ns=sc.nsample,
                        interpret=self.kernel_interpret,
                    )
                    for m, sc, g in zip(mlps_c, self.scales, cache.grouped)
                ]
                return cache.new_xyz, jnp.concatenate(outs, axis=-1)
            grouped = cache.grouped
            if getattr(cache, "channel_major", False):
                # XLA fallback for a channel-major cache (e.g. persisted on
                # TPU, loaded off it): restore the (R, M, ns, C0) layout
                # from the slot-flattened (R, C0p, ns*Mp) planes
                M = cache.new_xyz.shape[1]
                grouped = tuple(
                    g.reshape(g.shape[0], g.shape[1], sc.nsample, -1)[..., :M]
                    .transpose(0, 3, 2, 1)[..., : cache.c0]
                    for sc, g in zip(self.scales, grouped)
                )
            outs = [
                jnp.max(m.from_grouped(g, cache.new_xyz, mask=mask, train=train), axis=2)
                for m, g in zip(mlps_c, grouped)
            ]
            return cache.new_xyz, jnp.concatenate(outs, axis=-1)

        if self.fused_mode == "auto":
            fused = jax.default_backend() == "tpu"
            eval_kernel = not train
        else:
            fused = self.fused_mode in ("eval_kernel", "train_kernel")
            eval_kernel = self.fused_mode == "eval_kernel"
        scale_spec = tuple((float(sc.radius), int(sc.nsample)) for sc in self.scales)

        # v4 paths (eval AND train): FPS emits per-chunk hit counts as a free
        # byproduct (identical f32 arithmetic), giving the gated kernels
        # exact bounds with no pre-pass — only pays when supports span >= 2
        # chunks
        counts = None
        use_v4 = (
            (fused or self.kernel_interpret)
            and self.eval_subtile
            and xyz.shape[1] > _CHUNK
            and (not eval_kernel or all(len(sc.mlp) == 2 for sc in self.scales))
        )
        # "sa_kernel" tags: the selective-remat policy in train/loop.py saves
        # these kernel results across the VJP, so rematerialization recomputes
        # only the cheap BN/MLP chain — never the selection/FPS kernels
        from jax.ad_checkpoint import checkpoint_name

        if use_v4:
            from or4d_tpu.ops.pallas_fps import furthest_point_sample_with_counts

            idx, counts = furthest_point_sample_with_counts(
                xyz, self.npoint, tuple(r for r, _ns in scale_spec), self.kernel_interpret
            )
            counts = tuple(checkpoint_name(c, "sa_kernel") for c in counts)
        else:
            idx = ops.furthest_point_sample(xyz, self.npoint)
        idx = checkpoint_name(jax.lax.stop_gradient(idx), "sa_kernel")
        new_xyz = jnp.take_along_axis(xyz, idx[..., None], axis=1)  # (B, npoint, 3)

        mlps = [
            DelayedSharedMLP(sc.mlp, radius=sc.radius, nsample=sc.nsample, dtype=self.dtype, name=f"mlp_{si}")
            for si, sc in enumerate(self.scales)
        ]

        if features_alt is not None:
            # PAIRED eval: the two directions of an unordered relation pair
            # share xyz (hence FPS, distances, ranks, selection one-hots —
            # data/prep.py pair_shared) and differ only in the mask feature
            # channel. One kernel pass computes both: the per-support layer-1
            # planes are concatenated ([A_fwd | A_rev], filling the 128-lane
            # padding a 64-wide plane wastes), the folded-BN affines are
            # tiled, and W1 becomes blockdiag(W1, W1) — every step is exact
            # (one-hot selection picks single rows; blockdiag adds exact
            # zeros), so each direction's output is bit-identical to the
            # unpaired kernel on the same crop.
            kernel_ok = (
                (fused or self.kernel_interpret)
                and eval_kernel
                and all(len(sc.mlp) == 2 for sc in self.scales)
            )
            if not kernel_ok:
                raise ValueError("paired SA requires the fused eval kernel path")
            xyz_pre, feat_pre = self._pad_pre_inputs(xyz, features)
            _, feat_alt_pre = self._pad_pre_inputs(xyz, features_alt)
            C0 = 3 + features.shape[-1]

            def pair_tail(m):
                a0, b0, W1, a1, b1 = m.fused_eval_params()
                c1, c2 = W1.shape
                W1b = (
                    jnp.zeros((2 * c1, 2 * c2), W1.dtype)
                    .at[:c1, :c2].set(W1)
                    .at[c1:, c2:].set(W1)
                )
                return (
                    jnp.concatenate([a0, a0]), jnp.concatenate([b0, b0]),
                    W1b,
                    jnp.concatenate([a1, a1]), jnp.concatenate([b1, b1]),
                )

            if counts is not None:
                # v4 raw mode: the multi-GB [A_fwd|A_rev] planes never exist
                # in HBM — the kernel computes them in VMEM from one shared
                # channel-major [xyz|rgb|m_fwd|m_rev] plane. The paired W0
                # routes m_fwd to the fwd half and m_rev to the rev half
                # (exact: same rows W0 would have produced per direction).
                raw = jnp.concatenate(
                    [xyz_pre, feat_pre, feat_alt_pre[..., -1:]], axis=-1
                ).astype(self.dtype).transpose(0, 2, 1)  # (B, C0+1, Np)
                params = []
                for m in mlps:
                    W0 = m.w0_matrix(C0)  # (C0, C1)
                    z = jnp.zeros_like(W0[C0 - 1 : C0])
                    W0p = jnp.concatenate([
                        jnp.concatenate([W0[: C0 - 1], W0[: C0 - 1]], axis=1),
                        jnp.concatenate([W0[C0 - 1 : C0], z], axis=1),
                        jnp.concatenate([z, W0[C0 - 1 : C0]], axis=1),
                    ], axis=0)  # (C0+1, 2*C1)
                    Bq = m.bq_term(new_xyz, C0)
                    params.append((W0p, jnp.concatenate([Bq, Bq], axis=-1), *pair_tail(m)))
                outs = self._v4_call(
                    ball_query_group_mlp_pallas_v4, scale_spec, xyz, new_xyz,
                    tuple(params), _counts_to_bounds(scale_spec, counts), raw=raw,
                )
            else:
                params = []
                for m in mlps:
                    A, Bq = m.pre(xyz_pre, feat_pre, new_xyz)
                    A_alt, _ = m.pre(xyz_pre, feat_alt_pre, new_xyz)
                    params.append((
                        jnp.concatenate([A, A_alt], axis=-1),
                        jnp.concatenate([Bq, Bq], axis=-1),
                        *pair_tail(m),
                    ))
                # single-chunk supports (e.g. SA2's 512 SA1 centroids): the
                # ungated fused kernel — there is nothing for the v4 gates to
                # skip, but FPS/distances/prefix/compares still run once per
                # PAIR instead of once per direction
                outs = ball_query_group_mlp_pallas(
                    scale_spec, xyz, new_xyz, tuple(params),
                    self.kernel_interpret, None, False, self.eval_subtile,
                )
            # per scale (B, M, 2*C2) -> (B, M, 2, C2): dir axis before channels
            outs = [
                jnp.stack([o[..., : o.shape[-1] // 2], o[..., o.shape[-1] // 2 :]], axis=2)
                for o in outs
            ]
            return new_xyz, jnp.concatenate(outs, axis=-1)

        if fused or (use_v4 and self.kernel_interpret):
            if eval_kernel and all(len(sc.mlp) == 2 for sc in self.scales):
                # fully fused inference: one kernel computes every scale's
                # grouped features, folded-BN MLP and slot maxpool in VMEM
                xyz_pre, feat_pre = self._pad_pre_inputs(xyz, features)
                if counts is not None:
                    # v4 raw mode: A planes materialized in VMEM from one
                    # shared channel-major [p|f] plane (see the kernel doc)
                    C0 = 3 + (features.shape[-1] if features is not None else 0)
                    raw = (
                        jnp.concatenate([xyz_pre, feat_pre], axis=-1)
                        if feat_pre is not None else xyz_pre
                    ).astype(self.dtype).transpose(0, 2, 1)  # (B, C0, Np)
                    params = tuple(
                        (m.w0_matrix(C0), m.bq_term(new_xyz, C0), *m.fused_eval_params())
                        for m in mlps
                    )
                    outs = self._v4_call(
                        ball_query_group_mlp_pallas_v4, scale_spec, xyz, new_xyz,
                        params, _counts_to_bounds(scale_spec, counts), raw=raw,
                    )
                else:
                    pres = [m.pre(xyz_pre, feat_pre, new_xyz) for m in mlps]
                    params = tuple(
                        (A, Bq, *m.fused_eval_params()) for (A, Bq), m in zip(pres, mlps)
                    )
                    outs = ball_query_group_mlp_pallas(
                        scale_spec, xyz, new_xyz, params, self.kernel_interpret,
                        None, False, self.eval_subtile,
                    )
                return new_xyz, jnp.concatenate(outs, axis=-1)
            # training: grouped layer-1 features in one kernel, BN/ReLU +
            # later layers on the grouped tensors for exact batch statistics
            if counts is not None:
                # gated train path: queries sorted by the exact composite
                # key so the two-gate fires; BN/MLP/maxpool run in sorted
                # order (row masks are per cloud, hence order-invariant; BN
                # reductions reassociate — same multiset) and the pooled
                # (B, M, C2) outputs are un-permuted, keeping SA2's
                # order-dependent FPS semantics intact
                from or4d_tpu.ops.pallas_ball_query import (
                    _counts_to_bounds,
                    ball_query_group_pallas_gated,
                    ball_query_group_pallas_gated_raw,
                    bounds_order_key_argsort,
                )

                bounds = _counts_to_bounds(scale_spec, counts)
                if self.train_raw:
                    # raw mode: the A planes never exist in HBM (fwd builds
                    # them in VMEM, the VJP emits dW0 directly); legal here
                    # because this module's features are model inputs (the
                    # encoder sets train_raw on SA1 only — see the field doc)
                    C0 = 3 + (features.shape[-1] if features is not None else 0)
                    raw = (
                        jnp.concatenate([xyz, features], axis=-1)
                        if features is not None else xyz
                    ).astype(self.dtype).transpose(0, 2, 1)  # (B, C0, N)

                def run_scales(sidx):
                    """One gated kernel call (fwd + custom VJP) over the
                    scales in ``sidx``, queries sorted by their exact key
                    (composite across sidx, or solo when len(sidx)==1 —
                    train_per_scale_sort); pooled outputs are un-permuted,
                    so only BN-stat reassociation can differ."""
                    sspec = tuple(scale_spec[i] for i in sidx)
                    bnds = tuple(bounds[i] for i in sidx)
                    order = bounds_order_key_argsort(sspec, bnds)
                    inv_order = jnp.argsort(order, axis=1)
                    q_sorted = jnp.take_along_axis(new_xyz, order[..., None], axis=1)
                    bounds_sorted = tuple(
                        (jnp.take_along_axis(nd, order, axis=1), jnp.take_along_axis(th, order, axis=1))
                        for nd, th in bnds
                    )
                    # packed_slots: kernel emits slot pairs lane-packed
                    # (B, ns/2, M, 2C) — full-lane chain with no XLA relayout
                    ps = self.packed_slots and all(
                        self.scales[i].nsample % 2 == 0 and self.scales[i].mlp[0] < 128
                        for i in sidx
                    )
                    if self.train_raw:
                        grouped = ball_query_group_pallas_gated_raw(
                            sspec, xyz, q_sorted,
                            tuple(mlps[i].w0_matrix(C0) for i in sidx), raw,
                            bounds_sorted, self.kernel_interpret, ps,
                        )
                        bqs = [mlps[i].bq_term(new_xyz, C0) for i in sidx]
                    else:
                        pres = [mlps[i].pre(xyz, features, new_xyz) for i in sidx]
                        grouped = ball_query_group_pallas_gated(
                            sspec, xyz, q_sorted, tuple(A for A, _ in pres),
                            bounds_sorted, self.kernel_interpret, ps,
                        )
                        bqs = [Bq for _, Bq in pres]
                    grouped = tuple(checkpoint_name(g, "sa_kernel") for g in grouped)
                    # grouped tensors are SLOT-MAJOR (B, ns, M, C) — BN/MLP run
                    # in that layout (stats reduce over every non-channel axis,
                    # so axis order is irrelevant), maxpool over axis 1, and only
                    # the pooled (B, M, C2) result is un-permuted.
                    souts = []
                    for i, g, Bq in zip(sidx, grouped, bqs):
                        Bqs = jnp.take_along_axis(Bq, order[..., None], axis=1)
                        if ps:
                            h = mlps[i].post(g, Bqs, mask=mask, train=train, slot_major=True, packed=2)
                            pooled = jnp.max(h, axis=1)  # (B, M, 2*C2) — small
                            C2 = pooled.shape[-1] // 2
                            # slot max finishes across the lane pair (exact:
                            # max is commutative/associative)
                            pooled = jnp.maximum(pooled[..., :C2], pooled[..., C2:])
                        else:
                            h = mlps[i].post(g, Bqs, mask=mask, train=train, slot_major=True)
                            pooled = jnp.max(h, axis=1)  # (B, M, C2)
                        souts.append(jnp.take_along_axis(pooled, inv_order[..., None], axis=1))
                    return souts

                if self.train_per_scale_sort:
                    outs = [run_scales((si,))[0] for si in range(len(scale_spec))]
                else:
                    outs = run_scales(tuple(range(len(scale_spec))))
                return new_xyz, jnp.concatenate(outs, axis=-1)
            pres = [m.pre(xyz, features, new_xyz) for m in mlps]
            grouped = tuple(
                checkpoint_name(g, "sa_kernel")
                for g in ball_query_group_pallas(
                    scale_spec, xyz, new_xyz, tuple(A for A, _ in pres), self.kernel_interpret
                )
            )
            outs = [
                jnp.max(m.post(g, Bq, mask=mask, train=train), axis=2)
                for m, g, (_, Bq) in zip(mlps, grouped, pres)
            ]
            return new_xyz, jnp.concatenate(outs, axis=-1)

        # XLA fallback: one fused distance pass serves every scale
        scale_idx = tuple(
            checkpoint_name(i, "sa_kernel")
            for i in ball_query_multiscale(scale_spec, xyz, new_xyz)
        )
        outs = [
            jnp.max(m(xyz, features, new_xyz, jax.lax.stop_gradient(scale_idx[si]), mask=mask, train=train), axis=2)
            for si, m in enumerate(mlps)
        ]
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
    fused_mode: str = "auto"  # forwarded to the SA modules
    kernel_interpret: bool = False
    # extend pair sharing to SA2 (shared FPS/distances/selection over the 512
    # SA1 centroids — xyz is direction-invariant; only features differ). Exact
    # like SA1 pairing; opt-in until measured on-chip (selection MACs are
    # unchanged — C doubles while rows halve — only the per-row fixed work
    # halves, so the win is expected small).
    paired_sa2: bool = False
    # kernel-emitted slot-pair lane packing for the train chain (exact;
    # opt-in until measured — see SetAbstractionMSG.packed_slots)
    packed_slots: bool = False
    # solo-sorted per-scale eval kernels (exact; opt-in until measured — see
    # SetAbstractionMSG.per_scale_sort)
    per_scale_sort: bool = False
    # two-gate sub-tile rows (exact; tuning knob — see SetAbstractionMSG)
    eval_subtile: int = 32
    # raw-mode train kernels for SA1 (whose features are model inputs, so
    # the kernel's zero-feature-cotangent contract is exact for parameter
    # training — see SetAbstractionMSG.train_raw). SA2+ keep the non-raw
    # path: their features carry gradients. Opt-in until measured on-chip.
    train_raw: bool = False
    # solo-sorted per-scale TRAIN gated kernels (exact up to BN-stat
    # reassociation; measured win 2026-08-19, production default ON — see
    # SetAbstractionMSG.train_per_scale_sort). Only SA1 hits the gated path
    # at reference shapes (SA2's 512 supports are single-chunk).
    train_per_scale_sort: bool = False

    @nn.compact
    def __call__(self, pc, mask=None, train: bool = True, paired: bool = False, sa1_cache=None):
        """``sa1_cache``: serving-mode SA1 geometry (or4d_tpu/serving.py) —
        SA1 consumes the cached centroids/grouped planes instead of running
        FPS/ball query on ``pc`` (which may then be None); SA2/SA3 run
        normally on the 512 centroids.

        ``paired=True``: ``pc`` is (B, P, 8) — [xyz, rgb, mask_fwd,
        mask_rev] pair-shared relation crops (one row per unordered pair).
        Returns (2B, out_size) with rows interleaved [pair0-fwd, pair0-rev,
        pair1-fwd, ...]. SA1 runs ONCE per pair through the paired fused
        kernel (shared FPS/distances/selection); SA2/SA3 run per direction.
        Off the kernel path the directions are interleaved up front and the
        standard encoder runs — same results, no sharing."""
        knobs = dict(fused_mode=self.fused_mode, kernel_interpret=self.kernel_interpret,
                     packed_slots=self.packed_slots,
                     per_scale_sort=self.per_scale_sort, eval_subtile=self.eval_subtile,
                     train_per_scale_sort=self.train_per_scale_sort)
        sa1 = SetAbstractionMSG(
            npoint=self.sa_npoints[0],
            scales=(
                SAScale(SA1_RADII[0], self.sa_nsamples[0][0], (64, 64)),
                SAScale(SA1_RADII[1], self.sa_nsamples[0][1], (64, 128)),
            ),
            dtype=self.dtype,
            name="sa1",
            train_raw=self.train_raw,
            **knobs,
        )
        sa2 = SetAbstractionMSG(
            npoint=self.sa_npoints[1],
            scales=(
                SAScale(SA2_RADII[0], self.sa_nsamples[1][0], (128, 128)),
                SAScale(SA2_RADII[1], self.sa_nsamples[1][1], (128, 128)),
            ),
            dtype=self.dtype,
            name="sa2",
            **knobs,
        )
        sa3 = SetAbstractionAll(mlp=(256, self.out_size), dtype=self.dtype, name="sa3")

        from or4d_tpu.ops.pallas_ball_query import _CHUNK

        if sa1_cache is not None:
            if paired:
                raise ValueError("serving SA1 caches are unpaired (SA1 is skipped entirely)")
            xyz, features = sa1(None, None, mask=mask, train=train, cache=sa1_cache)
            xyz, features = sa2(xyz, features, mask=mask, train=train)
            _, features = sa3(xyz, features, mask=mask, train=train)
            return features

        if paired:
            if self.fused_mode == "auto":
                kernel_ok = jax.default_backend() == "tpu" and not train
            else:
                kernel_ok = self.fused_mode == "eval_kernel"
            kernel_ok = kernel_ok and pc.shape[1] > _CHUNK
            if kernel_ok:
                xyz = pc[..., 0:3].astype(jnp.float32)
                feats_fwd = pc[..., 3:7]
                feats_rev = jnp.concatenate([pc[..., 3:6], pc[..., 7:8]], axis=-1)
                new_xyz, feats = sa1(
                    xyz, feats_fwd, mask=mask, train=train, features_alt=feats_rev
                )  # (B, M, 3), (B, M, 2, C)
                if self.paired_sa2:
                    xyz2, feats = sa2(
                        new_xyz, feats[:, :, 0], mask=mask, train=train,
                        features_alt=feats[:, :, 1],
                    )  # (B, M2, 3), (B, M2, 2, C2)
                    B, M2, _, C2 = feats.shape
                    feats = feats.transpose(0, 2, 1, 3).reshape(B * 2, M2, C2)
                    xyz3 = jnp.repeat(xyz2, 2, axis=0)
                    mask2 = jnp.repeat(mask, 2, axis=0) if mask is not None else None
                    _, feats = sa3(xyz3, feats, mask=mask2, train=train)
                    return feats  # (2B, out_size) interleaved fwd/rev
                B, M, _, C = feats.shape
                feats = feats.transpose(0, 2, 1, 3).reshape(B * 2, M, C)
                xyz2 = jnp.repeat(new_xyz, 2, axis=0)
                mask2 = jnp.repeat(mask, 2, axis=0) if mask is not None else None
                xyz2, feats = sa2(xyz2, feats, mask=mask2, train=train)
                _, feats = sa3(xyz2, feats, mask=mask2, train=train)
                return feats  # (2B, out_size) interleaved fwd/rev
            # fallback: interleave directions and run the standard encoder
            pc2 = jnp.stack(
                [pc[..., 0:7], jnp.concatenate([pc[..., 0:6], pc[..., 7:8]], axis=-1)],
                axis=1,
            ).reshape((pc.shape[0] * 2,) + pc.shape[1:-1] + (7,))
            pc = pc2
            mask = jnp.repeat(mask, 2, axis=0) if mask is not None else None

        xyz = pc[..., 0:3].astype(jnp.float32)  # geometry stays f32 (FPS/query exactness)
        features = pc[..., 3:] if pc.shape[-1] > 3 else None

        xyz, features = sa1(xyz, features, mask=mask, train=train)
        xyz, features = sa2(xyz, features, mask=mask, train=train)
        _, features = sa3(xyz, features, mask=mask, train=train)
        return features
