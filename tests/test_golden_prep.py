"""Golden-file test for the data-preparation pipeline: a committed fixture
pins the exact prepared tensors for a fixed synthetic scene so silent prep
regressions are caught (SURVEY.md §4: the golden tests the reference lacked)."""

from pathlib import Path

import numpy as np
import pytest

from or4d_tpu.config import DatasetConfig
from or4d_tpu.data.synthetic import make_scene_sample

GOLDEN = Path(__file__).parent / "golden" / "prep_scene_seed7.npz"
TINY = DatasetConfig(num_points_objects=64, num_points_relation=96, max_objects=5, max_edges=20)


def build_sample():
    return make_scene_sample(seed=7, n_objects=4, ds=TINY, points_per_obj=250)


def test_prep_matches_golden():
    s = build_sample()
    if not GOLDEN.exists():
        GOLDEN.parent.mkdir(exist_ok=True)
        np.savez_compressed(
            GOLDEN,
            obj_points=s.obj_points,
            rel_points=s.rel_points,
            edge_index=s.edge_index,
            gt_class=s.gt_class,
            gt_rels=s.gt_rels,
            rel_onehot=s.rel_onehot,
            obj_mask=s.obj_mask,
            edge_mask=s.edge_mask,
            rel_hand_points=s.rel_hand_points,
        )
        pytest.skip("golden fixture created on first run; committed to the repo")
    g = np.load(GOLDEN)
    np.testing.assert_array_equal(s.edge_index, g["edge_index"])
    np.testing.assert_array_equal(s.gt_class, g["gt_class"])
    np.testing.assert_array_equal(s.gt_rels, g["gt_rels"])
    np.testing.assert_array_equal(s.obj_mask, g["obj_mask"])
    np.testing.assert_array_equal(s.edge_mask, g["edge_mask"])
    np.testing.assert_allclose(s.rel_onehot, g["rel_onehot"], atol=0)
    np.testing.assert_allclose(s.obj_points, g["obj_points"], atol=1e-6)
    np.testing.assert_allclose(s.rel_points, g["rel_points"], atol=1e-6)
    np.testing.assert_allclose(s.rel_hand_points, g["rel_hand_points"], atol=1e-6)
