"""HigherHRNet tests: trunk output resolutions, heatmap aggregation,
associative-embedding grouping."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from or4d_tpu.models import higherhrnet as hh


class TestModel:
    @pytest.fixture(scope="class")
    def net(self):
        model = hh.HigherHRNet(num_joints=14)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.key(0), x, train=False)
        return model, variables

    def test_output_resolutions(self, net):
        model, variables = net
        low, high = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
        assert low.shape == (1, 16, 16, 28)  # 1/4 res, joints + tags
        assert high.shape == (1, 32, 32, 14)  # 1/2 res, joints only

    def test_train_mode_updates_bn(self, net):
        model, variables = net
        _, updates = model.apply(
            variables, jnp.ones((1, 64, 64, 3)), train=True, mutable=["batch_stats"]
        )
        assert "batch_stats" in updates


class TestPostprocessing:
    def test_aggregate_heatmaps(self):
        low = np.zeros((8, 8, 28), np.float32)
        high = np.zeros((16, 16, 14), np.float32)
        low[4, 4, 0] = 1.0
        high[8, 8, 0] = 1.0
        agg = hh.aggregate_heatmaps(low, high)
        assert agg.shape == (16, 16, 14)
        assert agg[8, 8, 0] > 0.5

    def test_grouping_two_people(self):
        H = W = 32
        J = 14
        hm = np.zeros((H, W, J), np.float32)
        tags = np.zeros((H, W, J), np.float32)
        # person A at left (tag 0), person B at right (tag 5)
        for j in range(J):
            hm[5 + j % 3, 4, j] = 0.9
            tags[5 + j % 3, 4, j] = 0.0
            hm[20 + j % 3, 28, j] = 0.8
            tags[20 + j % 3, 28, j] = 5.0
        people = hh.group_people_by_tags(hm, tags)
        assert len(people) == 2
        counts = sorted([(p[:, 2] > 0).sum() for p in people])
        assert counts == [J, J]
        xs = sorted(p[p[:, 2] > 0][:, 0].mean() for p in people)
        assert xs[0] < 10 and xs[1] > 20

    def test_grouping_threshold_drops_weak(self):
        hm = np.zeros((16, 16, 14), np.float32)
        tags = np.zeros((16, 16, 14), np.float32)
        hm[4, 4, 0] = 0.05  # below detection threshold
        assert hh.group_people_by_tags(hm, tags) == []
