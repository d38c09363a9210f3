"""Fused ball-query+grouping kernel: forward and gradient parity against the
index+gather formulation (interpret mode; hardware parity is exercised by
bench/verify runs)."""

import numpy as np
import jax
import jax.numpy as jnp

from or4d_tpu.ops.ball_query import ball_query
from or4d_tpu.ops.pallas_ball_query import ball_query_group_pallas


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
