"""Group-Free loss tests: KPS positive selection, assignment semantics,
finite grads through the full detector."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from or4d_tpu.models import groupfree
from or4d_tpu.models.groupfree_loss import (
    groupfree_total_loss,
    kps_objectness_loss,
    layer_losses,
    sigmoid_focal_loss,
    smoothl1,
)


class TestPieces:
    def test_smoothl1(self):
        e = jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
        out = np.asarray(smoothl1(e))
        np.testing.assert_allclose(out, [1.5, 0.125, 0.0, 0.125, 1.5])

    def test_focal_loss_down_weights_easy(self):
        w = jnp.ones((1, 2))
        easy = float(sigmoid_focal_loss(jnp.array([[8.0, 0.0]]), jnp.array([[1.0, 1.0]]), w)[0, 0])
        hard = float(sigmoid_focal_loss(jnp.array([[8.0, 0.0]]), jnp.array([[1.0, 1.0]]), w)[0, 1])
        assert easy < hard

    def test_kps_matches_reference_oracle(self):
        """Labels replayed from a numpy oracle of the reference algorithm
        (incl. the faithful quirk: background seeds are assigned to the LAST
        GT box and can claim its topk slots before being zeroed)."""
        B, K, K2, topk = 1, 32, 2, 5
        rng = np.random.default_rng(0)
        seed_xyz = rng.uniform(-5, 5, size=(B, K, 3)).astype(np.float32)
        gt_center = np.array([[[0.0, 0, 0], [3.0, 3, 3]]], np.float32)
        gt_size = np.ones((B, K2, 3), np.float32)
        inst = np.full((B, K), -1)
        inst[0, :4] = 0
        inst[0, 4:7] = 1

        # numpy oracle (loss_helper.py:9-46)
        assign = np.where(inst < 0, K2 - 1, inst)
        label = np.zeros((B, K))
        for b in range(B):
            onehot = np.eye(K2)[assign[b]]  # (K, K2)
            delta = (seed_xyz[b][:, None] - gt_center[b][None]) / (gt_size[b][None] + 1e-6)
            dist = np.sqrt((delta**2).sum(-1) + 1e-6)
            dist = dist * onehot + 100 * (1 - onehot)
            for k2 in range(K2):
                for i in np.argsort(dist[:, k2])[:topk]:
                    label[b, i] = 1
            label[b][inst[b] < 0] = 0

        good = jnp.where(jnp.asarray(label) > 0, 4.0, -4.0)
        bad = jnp.zeros((B, K))
        args = (jnp.asarray(seed_xyz), jnp.asarray(inst), jnp.asarray(gt_center), jnp.asarray(gt_size), jnp.ones((B, K2)))
        l_good = float(kps_objectness_loss(args[0], good, *args[1:]))
        l_bad = float(kps_objectness_loss(args[0], bad, *args[1:]))
        assert l_good < l_bad
        # the quirk is active in this fixture: instance 1 (the last box) lost
        # topk slots to background seeds mapped onto it
        assert label[0, 4:7].sum() < 3


class TestEndToEnd:
    def test_total_loss_and_grads(self):
        model = groupfree.GroupFreeDetector(num_proposal=16, num_decoder_layers=2, width=1)
        rng = np.random.default_rng(1)
        pc = jnp.asarray(rng.standard_normal((1, 4096, 3)).astype(np.float32))
        mean_sizes = np.abs(rng.standard_normal((4, 3)).astype(np.float32)) + 0.5
        variables = model.init(jax.random.key(0), pc, jnp.asarray(mean_sizes), train=False)

        K2 = 4
        gt = {
            "center": jnp.asarray(rng.standard_normal((1, K2, 3)).astype(np.float32)),
            "size": jnp.ones((1, K2, 3)),
            "size_class": jnp.asarray(rng.integers(0, 4, (1, K2))),
            "size_residual": jnp.asarray(rng.standard_normal((1, K2, 3)).astype(np.float32)) * 0.1,
            "heading_class": jnp.asarray(rng.integers(0, 12, (1, K2))),
            "heading_residual": jnp.asarray(rng.uniform(-0.1, 0.1, (1, K2)).astype(np.float32)),
            "sem_class": jnp.asarray(rng.integers(0, 4, (1, K2))),
            "mask": jnp.ones((1, K2)),
        }
        seed_instance = jnp.asarray(rng.integers(-1, K2, (1, 1024)))

        def loss_fn(params):
            out = model.apply({"params": params, "batch_stats": variables["batch_stats"]}, pc, jnp.asarray(mean_sizes), train=False)
            seed_xyz = jnp.zeros((1, 1024, 3))
            total, _ = groupfree_total_loss(out, seed_instance, gt, mean_sizes, seed_xyz)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(loss))
        gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
        assert np.isfinite(gsum) and gsum > 0
