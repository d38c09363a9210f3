"""L1 trainer smoke tests: one step runs, loss finite, params update."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# full-suite lane only: multi-minute on the 1-core runner (pytest.ini)
pytestmark = pytest.mark.slow


def _changed(a, b):
    return any(
        not np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


class TestHigherHRNetTrainer:
    def test_one_step(self):
        from or4d_tpu.train.perception_trainers import HigherHRNetTrainer

        tr = HigherHRNetTrainer(num_joints=14, lr=1e-3)
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        state = tr.init_state(jax.random.key(0), images)
        gt_low = jnp.asarray(rng.random((1, 16, 16, 14)).astype(np.float32))
        gt_high = jnp.asarray(rng.random((1, 32, 32, 14)).astype(np.float32))
        pos = jnp.asarray(rng.integers(0, 16, (1, 3, 14, 2)))
        valid = jnp.ones((1, 3, 14), bool)
        params_before = jax.tree_util.tree_map(np.asarray, state["params"])
        state, loss, _ = tr.train_step(state, images, gt_low, gt_high, pos, valid)
        assert np.isfinite(float(loss))
        assert _changed(params_before, state["params"])


class TestVoxelPoseTrainer:
    def test_one_step(self):
        """Tiny-grid VoxelPose (the grids are config fields; architecture
        unchanged): the cord step updates the pose net immediately when a
        proposal matches, and the 4-step accumulated loss_3d step is the
        ONLY path that moves the proposal net (reference function.py:55-69 —
        grid centers flow through gradient-free top-k)."""
        from or4d_tpu.train.perception_trainers import VoxelPoseTrainer

        tr = VoxelPoseTrainer(model_kwargs=dict(
            initial_cube=(12, 12, 12), fine_cube=(8, 8, 8), max_people=3))
        rng = np.random.default_rng(3)
        C, J = 2, 14
        heatmaps = jnp.asarray(rng.random((C, J, 19, 25)).astype(np.float32))
        cameras = {
            "R": jnp.asarray(np.stack([np.eye(3)] * C).astype(np.float32)),
            "T": jnp.asarray(np.array([[0, 0, -6000.0], [500, 0, -6000.0]], np.float32)),
            "f": jnp.asarray(np.full((C, 2), 800.0, np.float32)),
            "c": jnp.asarray(np.full((C, 2), 1000.0, np.float32)),
            "size": jnp.asarray(np.full((C, 2), 2048.0, np.float32)),
        }
        hs = jnp.asarray(np.array([25 / 2048.0, 19 / 2048.0], np.float32))
        state = tr.init_state(jax.random.key(0), heatmaps, cameras, hs)
        # put the first GT root ON an actual proposal center: the untrained
        # 12^3 grid's voxels are ~700mm apart, so an arbitrary root would
        # match nothing within the 500mm radius and loss_cord would be 0
        (_, _, centers0, _), _ = tr.model.apply(
            {"params": state["params"], "batch_stats": state["batch_stats"]},
            heatmaps, cameras, hs, train=True, mutable=["batch_stats"],
        )
        gt_roots = jnp.asarray(
            np.stack([np.asarray(centers0)[0], np.zeros(3), np.zeros(3)]).astype(np.float32)
        )
        gt_poses = jnp.asarray(rng.normal(scale=400, size=(3, J, 3)).astype(np.float32))
        gt_vis = jnp.ones((3, J), jnp.float32)
        gt_mask = jnp.asarray([True, False, False])
        patient = jnp.asarray([True, False, False])
        target_3d = jnp.asarray(rng.random((12, 12, 12)).astype(np.float32))
        params_before = jax.tree_util.tree_map(np.asarray, state["params"])
        state, loss, extras = tr.train_step(
            state, heatmaps, cameras, hs, gt_roots, gt_poses, gt_vis, gt_mask, patient, target_3d)
        assert np.isfinite(float(loss))
        assert float(extras["loss_cord"]) > 0
        assert _changed(params_before["pose_v2v"], state["params"]["pose_v2v"])
        # proposal net untouched until the accumulation fires on the 4th step
        assert not _changed(params_before["proposal_v2v"], state["params"]["proposal_v2v"])
        for _ in range(3):
            state, loss, extras = tr.train_step(
                state, heatmaps, cameras, hs, gt_roots, gt_poses, gt_vis, gt_mask, patient, target_3d)
        assert _changed(params_before["proposal_v2v"], state["params"]["proposal_v2v"])
        assert float(state["accum3d_loss"]) == 0.0  # reset after firing


class TestGroupFreeTrainer:
    def test_one_step(self):
        from or4d_tpu.train.perception_trainers import GroupFreeTrainer

        tr = GroupFreeTrainer(num_proposal=16, num_decoder_layers=1)
        rng = np.random.default_rng(1)
        pc = jnp.asarray(rng.standard_normal((1, 4096, 3)).astype(np.float32))
        mean_sizes = jnp.asarray(np.abs(rng.standard_normal((4, 3))).astype(np.float32) + 0.5)
        state = tr.init_state(jax.random.key(0), pc, mean_sizes)
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
        point_instance_label = jnp.asarray(rng.integers(-1, K2, (1, 4096)))
        params_before = jax.tree_util.tree_map(np.asarray, state["params"])
        state, loss, parts = tr.train_step(state, pc, mean_sizes, point_instance_label, gt)
        assert np.isfinite(float(loss))
        assert _changed(params_before, state["params"])
        assert "kps" in parts
