"""Oriented-box geometry vs brute-force oracles (box_util.py semantics)."""

import numpy as np
import pytest

from or4d_tpu.models import groupfree
from or4d_tpu.ops.box_geometry import (
    box_corners,
    clip_polygon,
    nms_3d_samecls,
    oriented_box_iou,
    polygon_area,
)


def monte_carlo_iou(c1, s1, h1, c2, s2, h2, n=200_000, seed=0):
    """Brute-force IoU: sample the union AABB, test point membership in each
    oriented box."""
    rng = np.random.default_rng(seed)
    k1 = box_corners(np.asarray(c1, float), np.asarray(s1, float), h1)
    k2 = box_corners(np.asarray(c2, float), np.asarray(s2, float), h2)
    lo = np.minimum(k1.min(0), k2.min(0))
    hi = np.maximum(k1.max(0), k2.max(0))
    pts = rng.uniform(lo, hi, size=(n, 3))

    def inside(pts, c, s, h):
        d = pts - np.asarray(c, float)
        cos, sin = np.cos(h), np.sin(h)
        # inverse y-rotation
        x = cos * d[:, 0] - sin * d[:, 2]
        z = sin * d[:, 0] + cos * d[:, 2]
        y = d[:, 1]
        l, w, hh = s
        return (np.abs(x) <= l / 2) & (np.abs(y) <= hh / 2) & (np.abs(z) <= w / 2)

    in1 = inside(pts, c1, s1, h1)
    in2 = inside(pts, c2, s2, h2)
    box_vol = np.prod(hi - lo)
    inter = in1 & in2
    union = in1 | in2
    return inter.mean() * box_vol / max(union.mean() * box_vol, 1e-12)


class TestCorners:
    def test_axis_aligned_extents(self):
        k = box_corners(np.array([1.0, 2.0, 3.0]), np.array([2.0, 4.0, 6.0]), 0.0)
        assert k.shape == (8, 3)
        np.testing.assert_allclose(k[:, 0].min(), 0.0)   # x: 1 +- l/2=1
        np.testing.assert_allclose(k[:, 0].max(), 2.0)
        np.testing.assert_allclose(k[:, 1].min(), -1.0)  # y: 2 +- h/2=3
        np.testing.assert_allclose(k[:, 1].max(), 5.0)
        np.testing.assert_allclose(k[:, 2].min(), 1.0)   # z: 3 +- w/2=2
        np.testing.assert_allclose(k[:, 2].max(), 5.0)
        # layout contract: 0-3 top (+h/2), 4-7 bottom
        np.testing.assert_allclose(k[:4, 1], 5.0)
        np.testing.assert_allclose(k[4:, 1], -1.0)

    def test_footprint_counter_clockwise(self):
        k = box_corners(np.zeros(3), np.array([2.0, 1.0, 1.0]), 0.3)
        rect = k[3::-1][:, [0, 2]]
        x, y = rect[:, 0], rect[:, 1]
        signed = 0.5 * (np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))
        assert polygon_area(rect) > 0
        assert clip_polygon(rect, rect) is not None


class TestOrientedIoU:
    @pytest.mark.parametrize("h1,h2", [(0.0, 0.0), (0.0, np.pi / 4), (0.3, -0.7), (np.pi / 2, 0.0)])
    def test_matches_monte_carlo(self, h1, h2):
        c1, s1 = [0.0, 0.0, 0.0], [2.0, 1.0, 1.0]
        c2, s2 = [0.5, 0.1, 0.2], [1.5, 1.2, 0.8]
        got, _ = oriented_box_iou(box_corners(np.array(c1), np.array(s1), h1),
                                  box_corners(np.array(c2), np.array(s2), h2))
        want = monte_carlo_iou(c1, s1, h1, c2, s2, h2)
        assert got == pytest.approx(want, abs=0.02)

    def test_identical_boxes(self):
        k = box_corners(np.array([1.0, 1.0, 1.0]), np.array([2.0, 3.0, 1.0]), 0.9)
        iou3d, iou2d = oriented_box_iou(k, k)
        assert iou3d == pytest.approx(1.0, abs=1e-6)
        assert iou2d == pytest.approx(1.0, abs=1e-6)

    def test_disjoint(self):
        k1 = box_corners(np.zeros(3), np.ones(3), 0.4)
        k2 = box_corners(np.array([10.0, 0, 0]), np.ones(3), -0.4)
        iou3d, iou2d = oriented_box_iou(k1, k2)
        assert iou3d == 0.0 and iou2d == 0.0

    def test_rotation_matters_vs_axis_aligned(self):
        """A thin box rotated 90deg barely overlaps itself; the axis-aligned
        (center/size) approximation says IoU=1. The oriented result must
        match the oracle, provably differing from the approximation."""
        c, s = [0.0, 0.0, 0.0], [4.0, 0.5, 1.0]
        got, _ = oriented_box_iou(box_corners(np.array(c), np.array(s), 0.0),
                                  box_corners(np.array(c), np.array(s), np.pi / 2))
        want = monte_carlo_iou(c, s, 0.0, c, s, np.pi / 2)
        assert got == pytest.approx(want, abs=0.02)
        axis_aligned = 1.0  # same center+size ignoring heading
        assert got < 0.3 < axis_aligned


class TestOrientedAP:
    def test_rotated_fp_demotes_ap(self):
        """With oriented IoU the 90deg-rotated thin box is a false positive;
        axis-aligned IoU would call it a match and report AP=1."""
        c, s = [0.0, 0.0, 0.0], [4.0, 0.5, 1.0]
        gt = {"s1": [(0, c, s, 0.0)]}
        pred_rotated = {"s1": [(0, c, s, np.pi / 2, 0.9)]}
        pred_aligned = {"s1": [(0, c, s, 0.0, 0.9)]}
        assert groupfree.eval_average_precision(pred_aligned, gt)[0] == pytest.approx(1.0)
        assert groupfree.eval_average_precision(pred_rotated, gt)[0] == pytest.approx(0.0)


class TestNMS:
    def test_rotated_corner_aabb_suppression(self):
        """Reference NMS overlaps via the AABB of rotated corners: two thin
        crossed boxes have low true IoU but high corner-AABB IoU, so the
        lower-scored one IS suppressed (faithful to nms_3d_faster_samecls)."""
        centers = np.zeros((2, 3))
        sizes = np.array([[4.0, 0.5, 1.0], [4.0, 0.5, 1.0]])
        headings = np.array([np.pi / 4, -np.pi / 4])
        scores = np.array([0.9, 0.8])
        classes = np.zeros(2, np.int64)
        keep = nms_3d_samecls(centers, sizes, headings, scores, classes, iou_threshold=0.25)
        assert list(keep) == [0]

    def test_ascending_argsort_pick_order(self):
        centers = np.array([[0, 0, 0], [10, 0, 0], [20, 0, 0]], float)
        sizes = np.ones((3, 3))
        keep = nms_3d_samecls(centers, sizes, np.zeros(3), np.array([0.1, 0.9, 0.5]),
                              np.zeros(3, np.int64))
        assert list(keep) == [1, 2, 0]  # descending score pick order
