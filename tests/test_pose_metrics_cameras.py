"""Pose metrics (MPJPE/PCP), camera calibration loader, coord transforms,
and FLAG training."""

import json

import numpy as np
import jax
import pytest

from or4d_tpu.data.cameras import (
    cam_infos_to_voxelpose,
    coord_transform_or4d_to_pose_tool,
    coord_transform_pose_tool_to_or4d,
    load_cam_infos,
    quat_to_matrix,
    scale_registered_translation,
)
from or4d_tpu.train.pose_metrics import match_poses, mpjpe, pcp, recall_at


class TestPoseMetrics:
    def test_mpjpe_identity(self):
        gt = np.random.default_rng(0).standard_normal((2, 14, 3))
        assert mpjpe(gt.copy(), gt) == pytest.approx(0.0)

    def test_mpjpe_known_offset(self):
        gt = np.zeros((1, 14, 3))
        pred = gt + [3.0, 0, 4.0]  # 5mm offset everywhere
        assert mpjpe(pred, gt) == pytest.approx(5.0)

    def test_matching_handles_permutation(self):
        rng = np.random.default_rng(1)
        gt = rng.standard_normal((3, 14, 3)) * 100
        pred = gt[[2, 0, 1]] + 0.01
        pairs = dict(match_poses(pred, gt))
        assert pairs == {0: 1, 1: 2, 2: 0}
        assert mpjpe(pred, gt) < 0.02

    def test_pcp(self):
        from or4d_tpu.config import LIMBS

        gt = np.zeros((1, 14, 3))
        for j in range(14):
            gt[0, j] = [j * 100.0, 0, 0]
        assert pcp(gt.copy(), gt) == pytest.approx(1.0)
        far = gt + 1e4
        # matched (only one person) but every limb wrong
        assert pcp(far, gt) == pytest.approx(0.0)

    def test_recall(self):
        gt = np.zeros((2, 14, 3))
        gt[1] += 5000
        pred = gt[:1] + 10.0
        assert recall_at(pred, gt) == pytest.approx(0.5)


class TestCoordTransforms:
    def test_roundtrip(self):
        rng = np.random.default_rng(2)
        pts = rng.standard_normal((7, 3)) * 1000
        back = coord_transform_pose_tool_to_or4d(coord_transform_or4d_to_pose_tool(pts))
        np.testing.assert_allclose(back, pts, atol=1e-9)

    def test_quat_identity(self):
        np.testing.assert_allclose(quat_to_matrix(0, 0, 0, 1), np.eye(3), atol=1e-12)

    def test_quat_matches_scipy(self):
        from scipy.spatial.transform import Rotation

        q = [0.1, -0.4, 0.3, 0.85]
        np.testing.assert_allclose(quat_to_matrix(*q), Rotation.from_quat(q).as_matrix(), atol=1e-10)

    def test_depth_scaling(self):
        t = np.eye(4)
        t[:3, 3] = [1, 2, 3]
        out = scale_registered_translation(t)
        np.testing.assert_allclose(out[:3, 3], [2000, 4000, 6000])


def _fake_cam_json(tmp_path, idx):
    def mat_entries(values):
        return {f"m{i}{j}": float(values[j][i]) for i in range(3) for j in range(3)}

    data = {
        "value0": {
            "color_parameters": {
                "intrinsics_matrix": mat_entries(np.eye(3) * 500),
                "fov_x": 500.0, "fov_y": 500.0, "c_x": 1024.0, "c_y": 768.0,
                "width": 2048, "height": 1536,
                "radial_distortion": {f"m{i}0": 0.0 for i in range(6)},
                "tangential_distortion": {"m00": 0.0, "m10": 0.0},
            },
            "camera_pose": {
                "rotation": {"x": 0.0, "y": 0.0, "z": 0.0, "w": 1.0},
                "translation": {"m00": 1.0 * idx, "m10": 2.0, "m20": 3.0},
            },
            "color2depth_transform": {
                "rotation": {"x": 0.0, "y": 0.0, "z": 0.0, "w": 1.0},
                "translation": {"m00": 0.0, "m10": 0.0, "m20": 0.0},
            },
        }
    }
    (tmp_path / f"camera0{idx}.json").write_text(json.dumps(data))


class TestCamLoader:
    def test_load_and_convert(self, tmp_path):
        for i in range(1, 7):
            _fake_cam_json(tmp_path, i)
        infos = load_cam_infos(tmp_path)
        assert len(infos) == 6
        np.testing.assert_allclose(infos["camera01"]["extrinsics"][:3, 3], [1, 2, 3])
        assert infos["camera03"]["width"] == 2048
        vp = cam_infos_to_voxelpose(infos)
        assert vp["R"].shape == (6, 3, 3) and vp["T"].shape == (6, 3)
        # T carries the x500 OR_4D export scale; R carries the y/z flip
        np.testing.assert_allclose(vp["T"][1], [1000, 1000, 1500])
        ext = np.asarray(infos["camera02"]["extrinsics"], np.float64)
        np.testing.assert_allclose(vp["R"][1], np.diag([1.0, -1.0, -1.0]) @ ext[:3, :3].T, atol=1e-12)


class TestFlag:
    def test_flag_step_runs_and_updates(self):
        from or4d_tpu.pipeline.role_dataset import make_synthetic_role_dataset
        from or4d_tpu.train.graphormer_trainer import GraphormerTrainer

        trainer = GraphormerTrainer(n_layers=1, hidden=16, ffn=16, heads=4, peak_lr=1e-3, warmup_updates=2, tot_updates=50)
        (batch, label), *_ = make_synthetic_role_dataset(tracks_per_role=1, n_frames=2, max_graphs=2)
        state = trainer.init_state(jax.random.key(0), batch)
        new_state, loss = trainer.flag_train_step(state, batch, label, jax.random.key(1), m=2)
        assert np.isfinite(loss)
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(state["params"]), jax.tree_util.tree_leaves(new_state["params"]))
        )
        assert changed


class TestVoxelposeEvaluate:
    """OR_4D.evaluate parity: nearest-by-MPJPE matching, mean-endpoint PCP,
    per-actor-slot accumulation, first-3 average."""

    def test_perfect_predictions(self):
        from or4d_tpu.train.pose_metrics import voxelpose_evaluate

        rng = np.random.default_rng(0)
        gt = [rng.standard_normal((14, 3)) * 100 for _ in range(2)]
        actor_pcp, avg_pcp, _, recall = voxelpose_evaluate([np.stack(gt)], [gt])
        assert recall == pytest.approx(1.0, abs=1e-6)
        np.testing.assert_allclose(actor_pcp[:2], 1.0, atol=1e-8)
        assert avg_pcp == pytest.approx(2.0 / 3.0, rel=1e-6)  # slot 2 never seen

    def test_nearest_not_unique_matching(self):
        """Two GT people can share ONE prediction (per-GT argmin, unlike a
        greedy unique assignment)."""
        from or4d_tpu.train.pose_metrics import voxelpose_evaluate

        g1 = np.zeros((14, 3))
        g2 = np.zeros((14, 3)) + 100.0
        pred = np.stack([g1 + 1.0])  # one prediction near g1
        _, _, _, recall = voxelpose_evaluate([pred], [[g1, g2]])
        assert recall == pytest.approx(1.0, abs=1e-6)  # both under 500mm MPJPE

    def test_mean_endpoint_pcp_criterion(self):
        """A limb counts when (e_s + e_e)/2 <= alpha * length — one endpoint
        may exceed alpha*len if the other compensates (unlike both-below)."""
        from or4d_tpu.config import LIMBS
        from or4d_tpu.train.pose_metrics import voxelpose_evaluate

        gt = np.zeros((14, 3))
        # a straight vertical chain: joint j at z = j * 100 -> limb lengths 100..
        gt[:, 2] = np.arange(14) * 100.0
        pred = gt.copy()
        a, b = LIMBS[0]
        limb_len = np.linalg.norm(gt[a] - gt[b])
        # endpoint a off by 0.8*len, b perfect: mean 0.4*len <= 0.5*len -> correct
        pred[a, 0] += 0.8 * limb_len
        actor_pcp, _, _, _ = voxelpose_evaluate([pred[None]], [[gt]])
        # every limb touching joint a degrades but only by the mean rule
        assert actor_pcp[0] > 0.9

    def test_empty_predictions_count_gt(self):
        from or4d_tpu.train.pose_metrics import voxelpose_evaluate

        gt = [np.zeros((14, 3))]
        _, _, _, recall = voxelpose_evaluate([np.zeros((0, 14, 3))], [gt])
        assert recall == pytest.approx(0.0, abs=1e-6)
