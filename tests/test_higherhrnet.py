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


class TestHeatmapParser:
    """The reference HeatmapParser pipeline (core/group.py) — Munkres
    matching, quarter-pixel adjust, tag-guided refine."""

    def _two_people(self, J=14, H=32, W=32):
        det = np.zeros((J, H, W), np.float32)
        tag = np.zeros((J, H, W), np.float32)
        tag += 5.0  # background tag far from both people
        for j in range(J):
            det[j, 5 + j % 3, 4] = 0.9
            tag[j, 5 + j % 3, 4] = 0.0
            det[j, 20 + j % 3, 28] = 0.8
            tag[j, 20 + j % 3, 28] = 2.0
        return det, tag

    def test_parse_two_people(self):
        from or4d_tpu.pipeline import ae_grouping as ae

        det, tag = self._two_people()
        people, scores = ae.parse_heatmaps(det, tag, do_adjust=False, do_refine=False)
        assert people.shape[0] == 2
        counts = sorted([(p[:, 2] > 0).sum() for p in people])
        assert counts == [14, 14]
        assert all(s > 0.5 for s in scores)

    def test_munkres_beats_greedy_ordering(self):
        """Two fresh joints, two persons: greedy (first peak takes its
        nearest person) misassigns when the higher peak is slightly closer
        to the WRONG person; the Hungarian optimum fixes the pair."""
        from or4d_tpu.pipeline import ae_grouping as ae
        from scipy.optimize import linear_sum_assignment

        # person means: 0.0 and 1.0 ; fresh joints' tags: 0.55 (strong peak)
        # and 0.05 (weak peak). Greedy gives strong->person0 (d=.55) leaving
        # weak->person1 (d=.95): total .55+.95 = 1.5 raw. Hungarian picks
        # strong->person1? cost uses round(d)*100 - val: round(.55)=1 vs
        # round(.45)=0 -> assignment flips to strong->person1 (cost -0.9)
        # weak->person0 (round(.05)=0, cost -0.8): total raw .45+.05 = .5.
        diff = np.array([[0.55, 0.45], [0.05, 0.95]])
        cost = np.round(diff) * 100 - np.array([[0.9], [0.8]])
        rows, cols = linear_sum_assignment(cost)
        assign = dict(zip(rows, cols))
        assert assign == {0: 1, 1: 0}  # the non-greedy optimum

    def test_nms_and_topk(self):
        from or4d_tpu.pipeline import ae_grouping as ae

        det = np.zeros((1, 16, 16), np.float32)
        det[0, 5, 5] = 0.9
        det[0, 5, 6] = 0.8  # suppressed by the 5x5 NMS window
        det[0, 12, 12] = 0.7
        tag = np.zeros((1, 16, 16, 1), np.float32)
        tag_k, loc_k, val_k = ae.top_k(det, tag, max_people=3)
        assert val_k[0, 0] == np.float32(0.9) and tuple(loc_k[0, 0]) == (5, 5)
        assert val_k[0, 1] == np.float32(0.7) and tuple(loc_k[0, 1]) == (12, 12)
        assert val_k[0, 2] == 0.0

    def test_refine_fills_missing_joint(self):
        from or4d_tpu.pipeline import ae_grouping as ae

        J, H, W = 3, 16, 16
        det = np.zeros((J, H, W), np.float32)
        tag = np.zeros((J, H, W, 1), np.float32)
        kp = np.zeros((J, 4), np.float32)
        # joints 0/1 detected at tag 0; joint 2 missing but has a peak
        kp[0] = (4, 4, 0.9, 0)
        kp[1] = (5, 5, 0.9, 0)
        det[2, 8, 9] = 0.6
        out = ae.refine(det, tag, kp.copy())
        assert out[2, 2] == np.float32(0.6)
        assert abs(out[2, 0] - 9.5) <= 0.25 + 1e-6 and abs(out[2, 1] - 8.5) <= 0.25 + 1e-6

    def test_parse_separates_close_tags_consistently(self):
        """End-to-end: parse with adjust+refine keeps both people apart and
        every joint filled (refine backfills any drop)."""
        from or4d_tpu.pipeline import ae_grouping as ae

        det, tag = self._two_people()
        people, _ = ae.parse_heatmaps(det, tag)
        assert people.shape[0] == 2
        for p in people:
            assert (p[:, 2] > 0).all()
