"""Group-Free OR_4D detection dataset on the real-format fixture
(OR_4D_detection_dataset.py:39-213 semantics) + a short training run."""

from pathlib import Path

import numpy as np
import pytest

from or4d_tpu.data.groupfree_dataset import (
    NUM_HEADING_BIN,
    GroupFreeDetectionDataset,
    angle2class,
    build_scan_ret_dict,
    class2angle,
    compute_mean_size_arr,
    pca_obb,
    vec_ang,
)

ROOT = Path(__file__).parent / "golden" / "real_data"


class TestAngleClasses:
    @pytest.mark.parametrize("angle", [-np.pi, -1.3, 0.0, 0.26, 2.0, np.pi])
    def test_roundtrip(self, angle):
        cls, res = angle2class(angle)
        assert 0 <= cls < NUM_HEADING_BIN
        back = class2angle(cls, res)
        # equal modulo 2pi
        assert abs((back - angle + np.pi) % (2 * np.pi) - np.pi) < 1e-9

    def test_residual_bounds(self):
        per = 2 * np.pi / NUM_HEADING_BIN
        for angle in np.linspace(-np.pi, np.pi, 50):
            _, res = angle2class(float(angle))
            assert abs(res) <= per / 2 + 1e-9


class TestPCAOBB:
    def test_recovers_rotated_box_extents(self):
        rng = np.random.default_rng(0)
        # box of extents (4, 1, 2) rotated by -0.5 about y
        local = rng.uniform(-0.5, 0.5, (5000, 3)) * np.array([4.0, 1.0, 2.0])
        ang = -0.5
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        world = local @ R.T + np.array([10.0, 2.0, -3.0])
        box = pca_obb(world)
        # center is the AABB midpoint (reference recipe), near the true center
        np.testing.assert_allclose(box[:3], [10.0, 2.0, -3.0], atol=0.2)
        # PCA + re-rotation recovers the principal extent
        assert box[3:6].max() == pytest.approx(4.0, abs=0.3)
        assert box[4] == pytest.approx(1.0, abs=0.2)  # y extent untouched

    def test_vec_ang_range(self):
        assert vec_ang([1, 0], [1, 0]) == pytest.approx(0.0)
        assert vec_ang([-1, 0], [1, 0]) == pytest.approx(np.pi)
        assert 0 <= vec_ang([0.3, -0.7], [1, 0]) <= np.pi


class TestRetDict:
    def test_contract(self, tmp_path):
        rng = np.random.default_rng(0)
        ret = build_scan_ret_dict(ROOT, 1, "000000", num_points=2048, rng=rng, max_num_obj=8)
        assert ret["point_clouds"].shape == (2048, 6)
        # scaled to meters-ish: /1000
        assert np.abs(ret["point_clouds"][:, :3]).max() < 10.0
        k = int(ret["box_label_mask"].sum())
        assert k >= 3  # tables + op table + anesthesia machine
        assert (ret["center_label"][k:] > 100).all()  # padded centers pushed out
        assert ret["point_instance_label"].shape == (2048,)
        li = ret["point_instance_label"]
        assert (li >= -1).all() and (li < k).all()
        assert (li >= 0).any()
        assert set(np.unique(ret["sem_cls_label"][:k])) <= {0, 1, 2, 3}
        assert (np.abs(ret["heading_residual_label"]) <= np.pi / NUM_HEADING_BIN + 1e-9).all()

    def test_dataset_listing_and_cache(self, tmp_path):
        ds = GroupFreeDetectionDataset(ROOT, "train", num_points=1024, max_num_obj=8, cache_dir=tmp_path)
        assert ds.scan_names == ["1_000000", "1_000001"]
        a = ds[0]
        b = ds[0]  # cache hit
        np.testing.assert_array_equal(a["point_clouds"], b["point_clouds"])
        mean = ds.mean_size_arr()
        assert mean.shape == (4, 3) and (mean > 0).all()

    def test_mean_sizes_match_gt_boxes(self, tmp_path):
        ds = GroupFreeDetectionDataset(ROOT, "train", num_points=512, max_num_obj=8, cache_dir=tmp_path)
        arr = compute_mean_size_arr(ds)
        ret = ds[0]
        m = ret["box_label_mask"] > 0
        for cls, size in zip(ret["size_class_label"][m], ret["size_gts"][m]):
            # each box's size should be within 2x of its class mean on fixture
            assert (size < 3 * arr[int(cls)] + 1e-3).all()


class TestTrainOnFixture:
    def test_loss_decreases(self, tmp_path):
        import jax

        from or4d_tpu.train.perception_trainers import GroupFreeTrainer

        ds = GroupFreeDetectionDataset(ROOT, "train", num_points=4096, max_num_obj=8, cache_dir=tmp_path)
        mean = ds.mean_size_arr()
        batch = ds.batch([0, 1])
        tr = GroupFreeTrainer(num_proposal=16, num_decoder_layers=1, lr=1e-3)
        import jax.numpy as jnp

        state = tr.init_state(jax.random.key(0), jnp.asarray(batch["point_clouds"]), jnp.asarray(mean))
        losses = []
        for i in range(6):
            state, loss, _parts = tr.train_step_from_batch(state, batch, mean, key=jax.random.key(i))
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-2:]) < np.mean(losses[:2]), losses
