"""Fused ball-query+grouping kernel: forward and gradient parity against the
index+gather formulation (interpret mode; hardware parity is exercised by
bench/verify runs)."""

import numpy as np
import jax
import jax.numpy as jnp

from or4d_tpu.ops.ball_query import ball_query
from or4d_tpu.ops.pallas_ball_query import ball_query_group_pallas
import pytest

# full-suite lane only: multi-minute on the 1-core runner (pytest.ini)
pytestmark = pytest.mark.slow


def _setup(seed=0, B=2, N=700, M=140, C=64):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray((rng.standard_normal((B, N, 3)) * 0.5).astype(np.float32))
    new_xyz = xyz[:, :M, :]
    A = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    return xyz, new_xyz, A


class TestFusedGroup:
    def test_forward_parity_multiscale(self):
        xyz, new_xyz, A1 = _setup(0)
        A2 = _setup(1)[2]
        outs = ball_query_group_pallas(((0.15, 8), (0.3, 12)), xyz, new_xyz, (A1, A2), True)
        for s, (r, ns, A) in enumerate([(0.15, 8, A1), (0.3, 12, A2)]):
            idx = np.asarray(ball_query(r, ns, xyz, new_xyz))
            want = np.take_along_axis(np.asarray(A)[:, :, None, :], idx[..., None], axis=1)
            np.testing.assert_allclose(np.asarray(outs[s]), want, atol=1e-5)

    def test_gradient_parity(self):
        xyz, new_xyz, A = _setup(2)
        W = jnp.asarray(np.random.default_rng(3).standard_normal((140, 12, 64)).astype(np.float32))

        def loss_fused(A):
            g = ball_query_group_pallas(((0.3, 12),), xyz, new_xyz, (A,), True)[0]
            return jnp.sum(jnp.tanh(g) * W[None])

        def loss_gather(A):
            idx = ball_query(0.3, 12, xyz, new_xyz)
            g = jnp.take_along_axis(A[:, :, None, :], idx[..., None], axis=1)
            return jnp.sum(jnp.tanh(g) * W[None])

        v1, g1 = jax.value_and_grad(loss_fused)(A)
        v2, g2 = jax.value_and_grad(loss_gather)(A)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)

    def test_first_hit_fill_gradient_routing(self):
        """Slots beyond the hit count replicate slot 1's value; their grads
        must flow to the first hit (torch duplicate-index scatter-add)."""
        xyz = jnp.zeros((1, 8, 3)).at[0, :, 0].set(jnp.arange(8.0) * 10)
        xyz = xyz.at[0, 3, 0].set(20.05)  # point 3 near point 2 (only pair)
        new_xyz = xyz[:, 2:3, :]
        A = jnp.asarray(np.arange(8, dtype=np.float32)[None, :, None] + 1.0)

        def loss(A):
            g = ball_query_group_pallas(((0.5, 4),), xyz, new_xyz, (A,), True)[0]
            return jnp.sum(g)

        grad = np.asarray(jax.grad(loss)(A))[0, :, 0]
        # hits: point 2 (slot 1) and point 3 (slot 2); slots 3,4 fill with
        # point 2 -> grads: point2 gets 3 (slot1 + two fills), point3 gets 1
        np.testing.assert_allclose(grad[2], 3.0)
        np.testing.assert_allclose(grad[3], 1.0)
        assert (grad[[0, 1, 4, 5, 6, 7]] == 0).all()


class TestFusedGroupMLP:
    """Inference-fused group+MLP+maxpool kernel vs the composed eval path."""

    def _params(self, seed, C1, C2, M, B, xyz, new_xyz, A):
        rng = np.random.default_rng(seed)
        Bq = jnp.asarray(rng.standard_normal((B, M, C1)).astype(np.float32))
        a0 = jnp.asarray(rng.uniform(0.5, 1.5, C1).astype(np.float32))
        b0 = jnp.asarray(rng.standard_normal(C1).astype(np.float32) * 0.1)
        W1 = jnp.asarray(rng.standard_normal((C1, C2)).astype(np.float32) * 0.2)
        a1 = jnp.asarray(rng.uniform(0.5, 1.5, C2).astype(np.float32))
        b1 = jnp.asarray(rng.standard_normal(C2).astype(np.float32) * 0.1)
        return (A, Bq, a0, b0, W1, a1, b1)

    def test_parity_vs_composed(self):
        from or4d_tpu.ops.pallas_ball_query import ball_query_group_mlp_pallas

        B, N, M, C1, C2 = 2, 700, 140, 64, 96
        xyz, new_xyz, A1 = _setup(4, B, N, M, C1)
        A2 = _setup(5, B, N, M, C1)[2]
        scales = ((0.15, 8), (0.3, 12))
        p1 = self._params(6, C1, C2, M, B, xyz, new_xyz, A1)
        p2 = self._params(7, C1, 64, M, B, xyz, new_xyz, A2)
        outs = ball_query_group_mlp_pallas(scales, xyz, new_xyz, (p1, p2), True)

        for s, ((r, ns), p) in enumerate(zip(scales, (p1, p2))):
            A, Bq, a0, b0, W1, a1, b1 = p
            idx = np.asarray(ball_query(r, ns, xyz, new_xyz))
            g = np.take_along_axis(np.asarray(A)[:, :, None, :], idx[..., None], axis=1)
            h = np.maximum((g - np.asarray(Bq)[:, :, None, :]) * np.asarray(a0) + np.asarray(b0), 0)
            hw = h @ np.asarray(W1)
            o = np.maximum(hw * np.asarray(a1) + np.asarray(b1), 0)
            want = o.max(axis=2)  # maxpool over slots
            np.testing.assert_allclose(np.asarray(outs[s]), want, rtol=1e-4, atol=1e-4)

    def test_sa_stage_eval_equivalence(self):
        """SetAbstractionMSG's fused inference path (interpret-mode kernel)
        equals its index path with the same params in eval mode."""
        import jax

        from or4d_tpu.models.pointnet2 import SAScale, SetAbstractionMSG

        B, N = 2, 600
        rng = np.random.default_rng(8)
        xyz = jnp.asarray((rng.standard_normal((B, N, 3)) * 0.5).astype(np.float32))
        feats = jnp.asarray(rng.standard_normal((B, N, 4)).astype(np.float32))
        scales = (SAScale(0.2, 8, (16, 24)), SAScale(0.4, 12, (16, 32)))
        ref = SetAbstractionMSG(npoint=64, scales=scales, fused_mode="index")
        variables = ref.init(jax.random.key(0), xyz, feats, train=False)
        _, want = ref.apply(variables, xyz, feats, train=False)

        fused = SetAbstractionMSG(npoint=64, scales=scales, fused_mode="eval_kernel", kernel_interpret=True)
        _, got = fused.apply(variables, xyz, feats, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    def test_sa_stage_train_kernel_equivalence(self):
        """The merged train-path kernel (grouped tensors) matches the index
        path in train mode (batch statistics included)."""
        import jax

        from or4d_tpu.models.pointnet2 import SAScale, SetAbstractionMSG

        B, N = 2, 600
        rng = np.random.default_rng(9)
        xyz = jnp.asarray((rng.standard_normal((B, N, 3)) * 0.5).astype(np.float32))
        feats = jnp.asarray(rng.standard_normal((B, N, 4)).astype(np.float32))
        scales = (SAScale(0.2, 8, (16, 24)), SAScale(0.4, 12, (16, 32)))
        ref = SetAbstractionMSG(npoint=64, scales=scales, fused_mode="index")
        variables = ref.init(jax.random.key(0), xyz, feats, train=False)
        (_, want), want_stats = ref.apply(
            variables, xyz, feats, train=True, mutable=["batch_stats"])

        fused = SetAbstractionMSG(npoint=64, scales=scales, fused_mode="train_kernel", kernel_interpret=True)
        (_, got), got_stats = fused.apply(
            variables, xyz, feats, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(want_stats), jax.tree_util.tree_leaves(got_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


class TestFusedGroupMLPSorted:
    """Multi-tile shapes trigger the density sort + per-tile chunk gating;
    the inverse permutation must make results identical to the index path."""

    def test_order_key_matches_numpy(self):
        """The XLA ordering key = per-scale composite (dense by chunk-scan
        crossing, stragglers after by hit count), costliest scale first."""
        from or4d_tpu.ops.pallas_ball_query import _subtile_order_key

        B, N, M = 2, 1100, 256
        xyz, new_xyz, _ = _setup(21, B, N, M, 8)
        scales = ((0.15, 4), (0.3, 6))
        key = np.asarray(_subtile_order_key(scales, xyz, new_xyz, True))
        d2 = ((np.asarray(new_xyz)[:, :, None, :] - np.asarray(xyz)[:, None, :, :]) ** 2).sum(-1)
        keys_np = {}
        for r, ns in scales:
            hit = d2 < r * r
            tot_np = hit.sum(-1)
            chunks = np.add.reduceat(hit, np.arange(0, N, 512), axis=-1)
            ccum = np.cumsum(chunks, axis=-1)
            thr = np.minimum(tot_np, ns)
            need_np = (ccum < np.maximum(thr, 1)[..., None]).sum(-1) + 1
            keys_np[ns] = np.where(tot_np >= ns, need_np, 1000.0 + tot_np)
        want = keys_np[6] * 2048.0 + keys_np[4]
        np.testing.assert_allclose(key, want)

    def test_parity_subtile_two_gate(self):
        """The two-gate sub-tiled kernel (exact-bounds sort + per-sub-tile
        chunk/slot gating) is exactly the index path."""
        from or4d_tpu.ops.pallas_ball_query import ball_query_group_mlp_pallas
        from tests.test_fused_group import TestFusedGroupMLP, _setup

        B, N, M, C1, C2 = 1, 1100, 640, 32, 48  # nch=3, G=2
        xyz, new_xyz, A1 = _setup(22, B, N, M, C1)
        scales = ((0.15, 4), (0.3, 6))
        A2 = _setup(23, B, N, M, C1)[2]
        helper = TestFusedGroupMLP()
        p1 = helper._params(24, C1, C2, M, B, xyz, new_xyz, A1)
        p2 = helper._params(25, C1, 32, M, B, xyz, new_xyz, A2)
        outs = ball_query_group_mlp_pallas(scales, xyz, new_xyz, (p1, p2), True, None, False, 32)

        for s, ((r, ns), p) in enumerate(zip(scales, (p1, p2))):
            A, Bq, a0, b0, W1, a1, b1 = p
            idx = np.asarray(ball_query(r, ns, xyz, new_xyz))
            g = np.take_along_axis(np.asarray(A)[:, :, None, :], idx[..., None], axis=1)
            h = np.maximum((g - np.asarray(Bq)[:, :, None, :]) * np.asarray(a0) + np.asarray(b0), 0)
            hw = h @ np.asarray(W1)
            o = np.maximum(hw * np.asarray(a1) + np.asarray(b1), 0)
            want = o.max(axis=2)
            np.testing.assert_allclose(np.asarray(outs[s]), want, rtol=1e-4, atol=1e-4)

    def test_parity_v4_bounds_as_inputs(self):
        """The v4 kernel (exact bounds as inputs, lazy in-loop d2/prefix,
        carry-based ranks, chunk pairing when nch is even) is exactly the
        index path. Bounds computed in f32 numpy — the same IEEE arithmetic
        as the kernel's direct diff, hence exact."""
        from or4d_tpu.ops.pallas_ball_query import ball_query_group_mlp_pallas_v4
        from tests.test_fused_group import TestFusedGroupMLP, _setup

        for seed, (N, M) in ((31, (1100, 640)), (35, (2100, 640))):  # nch 3 (odd), 5->hmm
            B, C1, C2 = 1, 32, 48
            xyz, new_xyz, A1 = _setup(seed, B, N, M, C1)
            scales = ((0.15, 4), (0.3, 6))
            A2 = _setup(seed + 1, B, N, M, C1)[2]
            helper = TestFusedGroupMLP()
            p1 = helper._params(seed + 2, C1, C2, M, B, xyz, new_xyz, A1)
            p2 = helper._params(seed + 3, C1, 32, M, B, xyz, new_xyz, A2)

            # exact bounds from f32 numpy distance counts
            q = np.asarray(new_xyz, np.float32)
            p = np.asarray(xyz, np.float32)
            d = q[:, :, None, :] - p[:, None, :, :]
            d2 = (d.astype(np.float32) ** 2).sum(-1, dtype=np.float32)
            bounds = []
            for r, ns in scales:
                hit = d2 < np.float32(r * r)
                chunks = np.add.reduceat(hit, np.arange(0, N, 512), axis=-1).astype(np.float32)
                ccum = np.cumsum(chunks, axis=-1)
                tot = ccum[..., -1]
                thr = np.minimum(tot, float(ns))
                need = (ccum < thr[..., None]).sum(-1) + 1.0
                bounds.append((jnp.asarray(need, jnp.float32), jnp.asarray(thr, jnp.float32)))

            outs = ball_query_group_mlp_pallas_v4(
                scales, xyz, new_xyz, (p1, p2), tuple(bounds), True, None, 32
            )
            for s, ((r, ns), pp) in enumerate(zip(scales, (p1, p2))):
                A, Bq, a0, b0, W1, a1, b1 = pp
                idx = np.asarray(ball_query(r, ns, xyz, new_xyz))
                g = np.take_along_axis(np.asarray(A)[:, :, None, :], idx[..., None], axis=1)
                h = np.maximum((g - np.asarray(Bq)[:, :, None, :]) * np.asarray(a0) + np.asarray(b0), 0)
                hw = h @ np.asarray(W1)
                o = np.maximum(hw * np.asarray(a1) + np.asarray(b1), 0)
                want = o.max(axis=2)
                np.testing.assert_allclose(np.asarray(outs[s]), want, rtol=1e-4, atol=1e-4)

    def test_gated_group_forward_and_grad_parity(self):
        """The gated train-path grouping kernel (bounds as inputs) matches
        the index+gather formulation in values AND feature gradients."""
        import jax

        from or4d_tpu.ops.pallas_ball_query import ball_query_group_pallas_gated

        B, N, M, C = 1, 1100, 256, 16
        xyz, new_xyz, A = _setup(51, B, N, M, C)
        scales = ((0.15, 4), (0.3, 6))
        A2 = _setup(52, B, N, M, C)[2]

        q = np.asarray(new_xyz, np.float32)
        p = np.asarray(xyz, np.float32)
        d2 = ((q[:, :, None, :] - p[:, None, :, :]).astype(np.float32) ** 2).sum(-1, dtype=np.float32)
        bounds = []
        for r, ns in scales:
            hit = d2 < np.float32(r * r)
            chunks = np.add.reduceat(hit, np.arange(0, N, 512), axis=-1).astype(np.float32)
            ccum = np.cumsum(chunks, axis=-1)
            tot = ccum[..., -1]
            thr = np.minimum(tot, float(ns))
            need = (ccum < thr[..., None]).sum(-1) + 1.0
            bounds.append((jnp.asarray(need, jnp.float32), jnp.asarray(thr, jnp.float32)))
        bounds = tuple(bounds)

        outs = ball_query_group_pallas_gated(scales, xyz, new_xyz, (A, A2), bounds, True)
        for s, ((r, ns), Ax) in enumerate(zip(scales, (A, A2))):
            idx = np.asarray(ball_query(r, ns, xyz, new_xyz))
            want = np.take_along_axis(np.asarray(Ax)[:, :, None, :], idx[..., None], axis=1)
            # gated kernel output is slot-major (B, ns, M, C)
            np.testing.assert_allclose(np.asarray(outs[s]).transpose(0, 2, 1, 3), want, atol=1e-5)

        # gradient parity vs the gather formulation
        W = jnp.asarray(np.random.default_rng(53).standard_normal((M, 6, C)).astype(np.float32))
        Wsm = jnp.transpose(W, (1, 0, 2))  # slot-major weights (6, M, C)

        def loss_gated(A):
            g = ball_query_group_pallas_gated(scales, xyz, new_xyz, (A, A), bounds, True)
            return jnp.sum(jnp.tanh(g[1]) * Wsm[None]) + jnp.sum(g[0])

        def loss_gather(A):
            idx1 = ball_query(scales[0][0], scales[0][1], xyz, new_xyz)
            idx2 = ball_query(scales[1][0], scales[1][1], xyz, new_xyz)
            g1 = jnp.take_along_axis(A[:, :, None, :], idx1[..., None], axis=1)
            g2 = jnp.take_along_axis(A[:, :, None, :], idx2[..., None], axis=1)
            return jnp.sum(jnp.tanh(g2) * W[None]) + jnp.sum(g1)

        ga = jax.grad(loss_gated)(A)
        gb = jax.grad(loss_gather)(A)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=2e-4)

    def test_sa_stage_train_gated_equivalence(self):
        """SetAbstractionMSG's gated train path (sorted queries, un-permuted
        outputs) equals the index path up to BN reassociation."""
        import jax

        from or4d_tpu.models.pointnet2 import SAScale, SetAbstractionMSG

        rng = np.random.default_rng(61)
        B, N = 2, 1100
        pc = jnp.asarray((rng.standard_normal((B, N, 3)) * 0.5).astype(np.float32))
        feats = jnp.asarray(rng.standard_normal((B, N, 5)).astype(np.float32))
        scales = (SAScale(0.15, 4, (16, 24)), SAScale(0.3, 6, (16, 16)))
        kernel_mod = SetAbstractionMSG(npoint=128, scales=scales, fused_mode="train_kernel",
                                       kernel_interpret=True, eval_subtile=32)
        index_mod = SetAbstractionMSG(npoint=128, scales=scales, fused_mode="index")
        v = index_mod.init(jax.random.key(0), pc, feats, train=True)
        nx_i, f_i = index_mod.apply(v, pc, feats, train=True, mutable=["batch_stats"])[0]
        nx_k, f_k = kernel_mod.apply(v, pc, feats, train=True, mutable=["batch_stats"])[0]
        np.testing.assert_allclose(np.asarray(nx_k), np.asarray(nx_i), atol=1e-6)
        np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_i), rtol=1e-4, atol=1e-4)

    def test_gated_group_raw_mode_parity(self):
        """Raw-mode gated train kernel (VMEM A materialization + in-kernel
        dW0 accumulation): forward values match the non-raw kernel, and the
        dW0 cotangent matches autodiff through the explicit A = input @ W0
        construction — plain and pack_slots layouts."""
        import jax

        from or4d_tpu.ops.pallas_ball_query import (
            _counts_to_bounds,
            ball_query_group_pallas_gated,
            ball_query_group_pallas_gated_raw,
            bounds_order_key_argsort,
        )
        from or4d_tpu.ops.pallas_fps import furthest_point_sample_with_counts

        rng = np.random.default_rng(81)
        B, N, M = 1, 1100, 256
        scales = ((0.15, 4), (0.3, 6))
        xyz = jnp.asarray((rng.standard_normal((B, N, 3)) * 0.5).astype(np.float32))
        feats = jnp.asarray(rng.standard_normal((B, N, 4)).astype(np.float32))
        idx, counts = furthest_point_sample_with_counts(
            xyz, M, tuple(r for r, _ in scales), True)
        q = jnp.take_along_axis(xyz, idx[..., None], axis=1)
        bounds = _counts_to_bounds(scales, tuple(counts))
        order = bounds_order_key_argsort(scales, bounds)
        q_s = jnp.take_along_axis(q, order[..., None], axis=1)
        bounds_s = tuple(
            (jnp.take_along_axis(nd, order, axis=1), jnp.take_along_axis(th, order, axis=1))
            for nd, th in bounds
        )
        C0 = 7
        w0s = tuple(jnp.asarray(rng.standard_normal((C0, c)).astype(np.float32))
                    for c in (16, 24))
        inp = jnp.concatenate([xyz, feats], axis=-1)
        raw = inp.transpose(0, 2, 1)  # channel-major (B, C0, N)

        for ps in (False, True):
            g_non = ball_query_group_pallas_gated(
                scales, xyz, q_s, tuple(inp @ w for w in w0s), bounds_s, True, ps)
            g_raw = ball_query_group_pallas_gated_raw(
                scales, xyz, q_s, w0s, raw, bounds_s, True, ps)
            for a, b in zip(g_non, g_raw):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)

            def loss_raw(ws, ps=ps):
                outs = ball_query_group_pallas_gated_raw(
                    scales, xyz, q_s, ws, raw, bounds_s, True, ps)
                return sum(jnp.sum(jnp.sin(o)) for o in outs)

            def loss_non(ws, ps=ps):
                outs = ball_query_group_pallas_gated(
                    scales, xyz, q_s, tuple(inp @ w for w in ws), bounds_s, True, ps)
                return sum(jnp.sum(jnp.sin(o)) for o in outs)

            gr = jax.grad(loss_raw)(w0s)
            gn = jax.grad(loss_non)(w0s)
            for a, b in zip(gr, gn):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-3)

    def test_sa_stage_train_raw_equivalence(self):
        """SetAbstractionMSG(train_raw=True): same outputs, batch_stats and
        PARAM gradients as the non-raw gated path (up to f32 reassociation);
        feature cotangents are zero by contract (legal because the encoder
        enables raw mode only where features are model inputs)."""
        import jax

        from or4d_tpu.models.pointnet2 import SAScale, SetAbstractionMSG

        rng = np.random.default_rng(63)
        B, N = 2, 1100
        pc = jnp.asarray((rng.standard_normal((B, N, 3)) * 0.5).astype(np.float32))
        feats = jnp.asarray(rng.standard_normal((B, N, 5)).astype(np.float32))
        scales = (SAScale(0.15, 4, (16, 24)), SAScale(0.3, 6, (32, 16)))
        kw = dict(npoint=128, scales=scales, fused_mode="train_kernel",
                  kernel_interpret=True, eval_subtile=32)
        plain = SetAbstractionMSG(**kw)
        rawm = SetAbstractionMSG(train_raw=True, **kw)
        v = plain.init(jax.random.key(0), pc, feats, train=True)
        (nx_p, f_p), mut_p = plain.apply(v, pc, feats, train=True, mutable=["batch_stats"])
        (nx_r, f_r), mut_r = rawm.apply(v, pc, feats, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(nx_r), np.asarray(nx_p), atol=1e-6)
        np.testing.assert_allclose(np.asarray(f_r), np.asarray(f_p), rtol=1e-4, atol=1e-4)
        for (kp, sp), (kr, sr) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(mut_p["batch_stats"]), key=str),
            sorted(jax.tree_util.tree_leaves_with_path(mut_r["batch_stats"]), key=str),
        ):
            assert str(kp) == str(kr)
            np.testing.assert_allclose(np.asarray(sr), np.asarray(sp), rtol=1e-5, atol=1e-5)

        def loss(mod, params, f):
            out = mod.apply({**v, "params": params}, pc, f, train=True,
                            mutable=["batch_stats"])[0][1]
            return jnp.sum(out * out)

        gp = jax.grad(lambda p: loss(plain, p, feats))(v["params"])
        gr = jax.grad(lambda p: loss(rawm, p, feats))(v["params"])
        for (kp, a), (kr, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(gp), key=str),
            sorted(jax.tree_util.tree_leaves_with_path(gr), key=str),
        ):
            assert str(kp) == str(kr)
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-3)

    def test_gated_group_pack_slots_parity(self):
        """pack_slots emits (B, ns/2, M, 2C) slot pairs lane-packed; values
        are bit-identical to the unpacked layout, and the custom VJP routes
        packed cotangents through the same gradient as unpacked ones."""
        import jax

        from or4d_tpu.ops.pallas_ball_query import ball_query_group_pallas_gated

        B, N, M, C = 1, 1100, 256, 16
        xyz, new_xyz, A = _setup(71, B, N, M, C)
        scales = ((0.15, 4), (0.3, 6))
        A2 = _setup(72, B, N, M, C)[2]

        q = np.asarray(new_xyz, np.float32)
        p = np.asarray(xyz, np.float32)
        d2 = ((q[:, :, None, :] - p[:, None, :, :]).astype(np.float32) ** 2).sum(-1, dtype=np.float32)
        bounds = []
        for r, ns in scales:
            hit = d2 < np.float32(r * r)
            chunks = np.add.reduceat(hit, np.arange(0, N, 512), axis=-1).astype(np.float32)
            ccum = np.cumsum(chunks, axis=-1)
            tot = ccum[..., -1]
            thr = np.minimum(tot, float(ns))
            need = (ccum < thr[..., None]).sum(-1) + 1.0
            bounds.append((jnp.asarray(need, jnp.float32), jnp.asarray(thr, jnp.float32)))
        bounds = tuple(bounds)

        plain = ball_query_group_pallas_gated(scales, xyz, new_xyz, (A, A2), bounds, True)
        packed = ball_query_group_pallas_gated(scales, xyz, new_xyz, (A, A2), bounds, True, True)
        for (_, ns), o_plain, o_pack in zip(scales, plain, packed):
            # unpack: pair j lanes [0:C]/[C:2C] are slots 2j/2j+1
            up = np.concatenate(
                [np.asarray(o_pack)[:, :, None, :, :C], np.asarray(o_pack)[:, :, None, :, C:]], axis=2
            ).reshape(o_plain.shape)
            np.testing.assert_array_equal(up, np.asarray(o_plain))

        # gradient parity: packed cotangents route exactly like unpacked
        Wp = jnp.asarray(np.random.default_rng(73).standard_normal((3, 256, 2 * C)).astype(np.float32))

        def loss_packed(A):
            g = ball_query_group_pallas_gated(scales, xyz, new_xyz, (A, A), bounds, True, True)
            return jnp.sum(jnp.tanh(g[1]) * Wp[None]) + jnp.sum(g[0])

        def loss_plain(A):
            g = ball_query_group_pallas_gated(scales, xyz, new_xyz, (A, A), bounds, True)
            g1 = jnp.concatenate(
                [g[1][:, :, None, :, :], jnp.zeros_like(g[1][:, :, None, :, :])], axis=2
            )  # reshape plain (B, 6, M, C) into the packed view for the same loss
            gp = jnp.concatenate([g[1][:, 0::2], g[1][:, 1::2]], axis=-1)
            del g1
            return jnp.sum(jnp.tanh(gp) * Wp[None]) + jnp.sum(g[0])

        ga = jax.grad(loss_packed)(A)
        gb = jax.grad(loss_plain)(A)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=2e-4)

    def test_sa_stage_train_gated_packed_slots(self):
        """packed_slots (kernel-emitted slot-pair lane packing) — same
        outputs, same batch_stats, same grads as the plain gated train path
        up to BN reassociation."""
        import jax

        from or4d_tpu.models.pointnet2 import SAScale, SetAbstractionMSG

        rng = np.random.default_rng(63)
        B, N = 2, 1100
        pc = jnp.asarray((rng.standard_normal((B, N, 3)) * 0.5).astype(np.float32))
        feats = jnp.asarray(rng.standard_normal((B, N, 5)).astype(np.float32))
        scales = (SAScale(0.15, 4, (16, 24)), SAScale(0.3, 6, (32, 16)))
        kw = dict(npoint=128, scales=scales, fused_mode="train_kernel",
                  kernel_interpret=True, eval_subtile=32)
        plain = SetAbstractionMSG(**kw)
        packed = SetAbstractionMSG(packed_slots=True, **kw)
        v = plain.init(jax.random.key(0), pc, feats, train=True)
        (nx_p, f_p), mut_p = plain.apply(v, pc, feats, train=True, mutable=["batch_stats"])
        (nx_k, f_k), mut_k = packed.apply(v, pc, feats, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(nx_k), np.asarray(nx_p), atol=1e-6)
        np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_p), rtol=1e-4, atol=1e-4)
        for (kp, sp), (kk, sk) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(mut_p["batch_stats"]), key=str),
            sorted(jax.tree_util.tree_leaves_with_path(mut_k["batch_stats"]), key=str),
        ):
            assert str(kp) == str(kk)
            np.testing.assert_allclose(np.asarray(sk), np.asarray(sp), rtol=1e-5, atol=1e-5)

        def loss(mod, f):
            _, out = mod.apply(v, pc, f, train=True, mutable=["batch_stats"])[0]
            return jnp.sum(out * out)

        g_p = jax.grad(lambda f: loss(plain, f))(feats)
        g_k = jax.grad(lambda f: loss(packed, f))(feats)
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_p), rtol=2e-3, atol=2e-3)

    def test_sa_stage_train_per_scale_sort(self):
        """train_per_scale_sort (one solo-sorted gated TRAIN kernel call per
        scale) — same outputs, batch_stats, and gradients as the shared
        composite-sort call up to BN-stat reassociation, in both the non-raw
        and raw kernel variants (the production default combines it with
        train_raw + packed_slots)."""
        import jax

        from or4d_tpu.models.pointnet2 import SAScale, SetAbstractionMSG

        rng = np.random.default_rng(65)
        B, N = 2, 1100
        pc = jnp.asarray((rng.standard_normal((B, N, 3)) * 0.5).astype(np.float32))
        feats = jnp.asarray(rng.standard_normal((B, N, 5)).astype(np.float32))
        scales = (SAScale(0.15, 4, (16, 24)), SAScale(0.3, 6, (32, 16)))
        base = dict(npoint=128, scales=scales, fused_mode="train_kernel",
                    kernel_interpret=True, eval_subtile=32)
        for extra in (dict(), dict(train_raw=True, packed_slots=True)):
            kw = {**base, **extra}
            shared = SetAbstractionMSG(**kw)
            solo = SetAbstractionMSG(train_per_scale_sort=True, **kw)
            v = shared.init(jax.random.key(0), pc, feats, train=True)
            (nx_a, f_a), mut_a = shared.apply(v, pc, feats, train=True, mutable=["batch_stats"])
            (nx_b, f_b), mut_b = solo.apply(v, pc, feats, train=True, mutable=["batch_stats"])
            np.testing.assert_allclose(np.asarray(nx_b), np.asarray(nx_a), atol=1e-6)
            np.testing.assert_allclose(np.asarray(f_b), np.asarray(f_a), rtol=1e-4, atol=1e-4)
            for (ka, sa), (kb, sb) in zip(
                sorted(jax.tree_util.tree_leaves_with_path(mut_a["batch_stats"]), key=str),
                sorted(jax.tree_util.tree_leaves_with_path(mut_b["batch_stats"]), key=str),
            ):
                assert str(ka) == str(kb)
                np.testing.assert_allclose(np.asarray(sb), np.asarray(sa), rtol=1e-5, atol=1e-5)

            def loss(mod, params):
                _, out = mod.apply({**v, "params": params}, pc, feats, train=True,
                                   mutable=["batch_stats"])[0]
                return jnp.sum(out * out)

            g_a = jax.grad(lambda p: loss(shared, p))(v["params"])
            g_b = jax.grad(lambda p: loss(solo, p))(v["params"])
            for (ka, a), (kb, b) in zip(
                sorted(jax.tree_util.tree_leaves_with_path(g_a), key=str),
                sorted(jax.tree_util.tree_leaves_with_path(g_b), key=str),
            ):
                assert str(ka) == str(kb)
                np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-3)

    def test_sa_stage_v4_end_to_end(self):
        """SetAbstractionMSG's v4 eval path (FPS-fused counts -> bounds ->
        v4 kernel, interpret mode) equals the index path."""
        from or4d_tpu.models.pointnet2 import SAScale, SetAbstractionMSG

        rng = np.random.default_rng(41)
        B, N = 2, 1100
        pc = jnp.asarray((rng.standard_normal((B, N, 3)) * 0.5).astype(np.float32))
        feats = jnp.asarray(rng.standard_normal((B, N, 5)).astype(np.float32))
        scales = (SAScale(0.15, 4, (16, 24)), SAScale(0.3, 6, (16, 16)))

        kernel_mod = SetAbstractionMSG(npoint=128, scales=scales, fused_mode="eval_kernel",
                                       kernel_interpret=True, eval_subtile=32)
        index_mod = SetAbstractionMSG(npoint=128, scales=scales, fused_mode="index")
        v = index_mod.init(jax.random.key(0), pc, feats, train=False)
        nx_i, f_i = index_mod.apply(v, pc, feats, train=False)
        nx_k, f_k = kernel_mod.apply(v, pc, feats, train=False)
        np.testing.assert_allclose(np.asarray(nx_k), np.asarray(nx_i), atol=1e-6)
        np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_i), rtol=1e-4, atol=1e-4)

    def test_parity_with_sort_and_gating(self):
        from or4d_tpu.ops.pallas_ball_query import ball_query_group_mlp_pallas
        from tests.test_fused_group import TestFusedGroupMLP, _setup

        B, N, M, C1, C2 = 1, 1100, 640, 32, 48  # M > tm(512) -> G=2, sorted
        xyz, new_xyz, A1 = _setup(11, B, N, M, C1)
        scales = ((0.15, 4), (0.3, 6))
        A2 = _setup(12, B, N, M, C1)[2]
        helper = TestFusedGroupMLP()
        p1 = helper._params(13, C1, C2, M, B, xyz, new_xyz, A1)
        p2 = helper._params(14, C1, 32, M, B, xyz, new_xyz, A2)
        # gate_chunks=True + small tiles: density sort + dynamic chunk loop
        outs = ball_query_group_mlp_pallas(scales, xyz, new_xyz, (p1, p2), True, 128, True)

        for s, ((r, ns), p) in enumerate(zip(scales, (p1, p2))):
            A, Bq, a0, b0, W1, a1, b1 = p
            idx = np.asarray(ball_query(r, ns, xyz, new_xyz))
            g = np.take_along_axis(np.asarray(A)[:, :, None, :], idx[..., None], axis=1)
            h = np.maximum((g - np.asarray(Bq)[:, :, None, :]) * np.asarray(a0) + np.asarray(b0), 0)
            hw = h @ np.asarray(W1)
            o = np.maximum(hw * np.asarray(a1) + np.asarray(b1), 0)
            want = o.max(axis=2)
            np.testing.assert_allclose(np.asarray(outs[s]), want, rtol=1e-4, atol=1e-4)

    def test_sa_stage_v4_per_scale_sort(self):
        """per_scale_sort (one solo-sorted v4 kernel call per scale) is
        bit-identical to the shared-sort multi-scale call — the order only
        changes tile homogeneity, never results."""
        from or4d_tpu.models.pointnet2 import SAScale, SetAbstractionMSG

        rng = np.random.default_rng(43)
        B, N = 2, 1100
        pc = jnp.asarray((rng.standard_normal((B, N, 3)) * 0.5).astype(np.float32))
        feats = jnp.asarray(rng.standard_normal((B, N, 5)).astype(np.float32))
        scales = (SAScale(0.15, 4, (16, 24)), SAScale(0.3, 6, (16, 16)))

        shared = SetAbstractionMSG(npoint=128, scales=scales, fused_mode="eval_kernel",
                                   kernel_interpret=True, eval_subtile=32)
        solo = SetAbstractionMSG(npoint=128, scales=scales, fused_mode="eval_kernel",
                                 kernel_interpret=True, eval_subtile=32,
                                 per_scale_sort=True)
        v = shared.init(jax.random.key(0), pc, feats, train=False)
        nx_a, f_a = shared.apply(v, pc, feats, train=False)
        nx_b, f_b = solo.apply(v, pc, feats, train=False)
        np.testing.assert_array_equal(np.asarray(nx_b), np.asarray(nx_a))
        np.testing.assert_array_equal(np.asarray(f_b), np.asarray(f_a))
