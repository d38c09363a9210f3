"""HigherHRNet training-loss tests: heatmap MSE, AE pull/push, GT rendering."""

import numpy as np
import jax.numpy as jnp
import pytest

from or4d_tpu.models.higherhrnet import ae_loss, heatmap_loss, render_gt_heatmaps


class TestHeatmapLoss:
    def test_zero_on_match(self):
        hm = jnp.asarray(np.random.default_rng(0).random((8, 8, 14)).astype(np.float32))
        assert float(heatmap_loss(hm, hm)) == 0.0

    def test_mask(self):
        pred = jnp.ones((4, 4, 2))
        gt = jnp.zeros((4, 4, 2))
        mask = jnp.zeros((4, 4))
        assert float(heatmap_loss(pred, gt, mask)) == 0.0


class TestAELoss:
    def test_well_separated_tags(self):
        tags = jnp.zeros((16, 16, 3))
        tags = tags.at[2, 2, :].set(0.0).at[10, 10, :].set(5.0)
        pos = jnp.asarray([[[2, 2]] * 3, [[10, 10]] * 3])
        valid = jnp.ones((2, 3), bool)
        total, parts = ae_loss(tags, pos, valid)
        assert float(parts["pull"]) == pytest.approx(0.0, abs=1e-6)  # tags identical within person
        assert float(parts["push"]) < 1e-5  # means 5 apart -> exp(-25)

    def test_collapsed_tags_penalized(self):
        tags = jnp.ones((16, 16, 3)) * 2.0  # both people same tag
        pos = jnp.asarray([[[2, 2]] * 3, [[10, 10]] * 3])
        valid = jnp.ones((2, 3), bool)
        _, parts = ae_loss(tags, pos, valid)
        assert float(parts["push"]) == pytest.approx(1.0)  # exp(0)

    def test_invalid_people_ignored(self):
        tags = jnp.zeros((8, 8, 2))
        pos = jnp.zeros((3, 2, 2), jnp.int32)
        valid = jnp.zeros((3, 2), bool).at[0].set(True)
        total, parts = ae_loss(tags, pos, valid)
        assert float(parts["push"]) == 0.0  # only one valid person


class TestGTRendering:
    def test_peaks_at_joints(self):
        pos = jnp.asarray([[[5, 3], [12, 9]]])  # one person, two joints
        valid = jnp.ones((1, 2), bool)
        hm = np.asarray(render_gt_heatmaps(pos, valid, (16, 16)))
        assert hm.shape == (16, 16, 2)
        assert hm[3, 5, 0] == pytest.approx(1.0)
        assert hm[9, 12, 1] == pytest.approx(1.0)
        assert hm[0, 15, 0] < 1e-4
