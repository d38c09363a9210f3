"""L2 instance-labeling tests: box grids, projection semantics, the hand
exception, and the full scan path."""

from pathlib import Path

import numpy as np

from or4d_tpu.config import OBJECT_LABEL_MAP
from or4d_tpu.pipeline.instance_labels import (
    compute_instance_labels_for_scan,
    heading_to_rotmat,
    human_masks,
    label_humans,
    label_objects,
    oriented_box_to_grid,
    select_best_boxes,
    skeleton_to_limb_points,
)


def make_skeleton(center, scale=300.0):
    """A plausible upright 14-joint skeleton (y up)."""
    j = np.zeros((14, 3))
    j[0] = [0, 1.7, 0]      # head
    j[1] = [0, 1.5, 0]      # neck
    j[2] = [-0.2, 1.4, 0]   # l shoulder
    j[3] = [0.2, 1.4, 0]    # r shoulder
    j[4] = [-0.15, 0.9, 0]  # l hip
    j[5] = [0.15, 0.9, 0]   # r hip
    j[6] = [-0.3, 1.1, 0]   # l elbow
    j[7] = [0.3, 1.1, 0]    # r elbow
    j[8] = [-0.35, 0.8, 0]  # l wrist
    j[9] = [0.35, 0.8, 0]   # r wrist
    j[10] = [-0.15, 0.5, 0]
    j[11] = [0.15, 0.5, 0]
    j[12] = [-0.15, 0.05, 0]
    j[13] = [0.15, 0.05, 0]
    return j * scale + np.asarray(center)


class TestGeometry:
    def test_heading_rotmat_is_rotation(self):
        R = heading_to_rotmat(0.7)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(R[1], [0, 1, 0], atol=1e-12)

    def test_box_grid(self):
        box = np.array([10.0, 20.0, 30.0, 2.0, 4.0, 6.0, 0.0])
        grid = oriented_box_to_grid(box)
        assert grid.shape == (8000, 3)
        np.testing.assert_allclose(grid.mean(0), [10, 20, 30], atol=1e-9)
        np.testing.assert_allclose(grid.max(0) - grid.min(0), [2, 4, 6], atol=1e-9)

    def test_skeleton_points_near_limbs(self):
        joints = make_skeleton([0, 0, 0])
        pts = skeleton_to_limb_points(joints)
        assert len(pts) > 100
        # all points within radius of some limb segment (30 + eps)
        assert pts[:, 1].min() > joints[:, 1].min() - 31
        assert pts[:, 1].max() < joints[:, 1].max() + 31


class TestBoxSelection:
    def test_best_per_class_and_heading_fix(self):
        classes = np.array([1, 1, 0])
        boxes = np.array([
            [0, 0, 0, 1, 1, 1, 0.5],
            [1, 1, 1, 1, 1, 1, 0.5],
            [2, 2, 2, 1, 1, 1, 0.5],
        ])
        scores = np.array([0.2, 0.9, 0.5])
        out = dict(select_best_boxes(classes, boxes, scores))
        assert set(out) == {"operating_table", "anesthesia_equipment"}
        np.testing.assert_allclose(out["operating_table"][:3], [1000, 1000, 1000])
        assert out["operating_table"][6] == -0.5  # heading flip
        assert out["anesthesia_equipment"][6] == -0.5


class TestProjection:
    def test_label_objects_overwrite_order(self):
        rng = np.random.default_rng(0)
        points = rng.uniform(-1000, 1000, size=(5000, 3))
        grid_a = oriented_box_to_grid(np.array([0, 0, 0, 400, 400, 400, 0.0]))
        grid_b = oriented_box_to_grid(np.array([100, 0, 0, 400, 400, 400, 0.0]))
        labels = np.full(len(points), -1, np.int8)
        labels = label_objects(points, [("instrument_table", grid_a), ("operating_table", grid_b)], labels)
        # overlap region labeled by the LATER object
        overlap = np.all(np.abs(points - [100, 0, 0]) < 100, axis=1)
        assert (labels[overlap] == OBJECT_LABEL_MAP["operating_table"]).all()
        far = np.linalg.norm(points, axis=1) > 600
        assert (labels[far] == -1).all()

    def test_human_masks_and_hand_exception(self):
        rng = np.random.default_rng(1)
        joints = make_skeleton([0, 0, 0])
        body_pts = joints[1] + rng.normal(scale=40, size=(300, 3))
        wrist_pts = joints[9] + rng.normal(scale=30, size=(200, 3))
        far_pts = np.array([[5000.0, 5000, 5000]]).repeat(100, 0)
        points = np.concatenate([body_pts, wrist_pts, far_pts])
        body, hands = human_masks(points, joints)
        assert body[:300].mean() > 0.8
        assert not body[-100:].any() and not hands[-100:].any()
        # hand exception overwrites table labels near wrists
        labels = np.full(len(points), -1, np.int8)
        labels[300:500] = OBJECT_LABEL_MAP["operating_table"]
        labels = label_humans(points, {"human_0": joints}, labels)
        assert (labels[300:500] == OBJECT_LABEL_MAP["human_0"]).mean() > 0.9

    def test_hand_exception_respects_other_humans(self):
        joints = make_skeleton([0, 0, 0])
        pts = joints[9] + np.random.default_rng(2).normal(scale=20, size=(50, 3))
        labels = np.full(len(pts), OBJECT_LABEL_MAP["human_1"], np.int8)
        out = label_humans(pts, {"human_0": make_skeleton([4000, 0, 0])}, labels.copy())
        # distant human's hand mask cannot claim points labeled human_1
        assert (out == labels).all()


class TestFullScan:
    def test_end_to_end(self):
        rng = np.random.default_rng(3)
        table_pts = rng.uniform(-200, 200, size=(800, 3)) + [0, 500, 0]
        joints = make_skeleton([2000, 0, 0])
        human_pts = joints.mean(0) + rng.normal(scale=150, size=(800, 3))
        points = np.concatenate([table_pts, human_pts])
        boxes = {
            "classes": np.array([OBJECT_LABEL_MAP["instrument_table"]]),
            "bboxes": np.array([[0, 0.5, 0, 0.5, 0.5, 0.5, 0.0]]),
            "scores": np.array([0.9]),
        }
        labels = compute_instance_labels_for_scan(points, boxes=boxes, human_poses={"human_0": joints})
        assert labels.dtype == np.int8
        assert (labels[:800] == OBJECT_LABEL_MAP["instrument_table"]).mean() > 0.5
        assert (labels[800:] == OBJECT_LABEL_MAP["human_0"]).mean() > 0.3


class TestGTPath:
    """L2 GT-object + GT-human path and the per-take driver on the
    real-format fixture (compute_instance_labels.py:125-266)."""

    ROOT = Path(__file__).parent / "golden" / "real_data"

    def test_load_gt_objects(self):
        from or4d_tpu.pipeline.instance_labels import load_gt_objects

        objects = load_gt_objects(self.ROOT, 1, "000000")
        names = [n for n, _ in objects]
        # stationary tables always merge in; 'object' is rejected by the
        # manual json's false_objects
        assert "instrument_table" in names and "secondary_table" in names
        assert "object" not in names
        assert "operating_table" in names
        for name, pts in objects:
            assert pts.shape[1] == 3 and len(pts) > 0
        # transformed into world coordinates (centers in OR scale, not /2000)
        op = dict(objects)["operating_table"]
        assert np.linalg.norm(op.mean(0)) > 10.0

    def test_load_gt_humans_roundtrip(self):
        from or4d_tpu.pipeline.instance_labels import load_gt_humans

        humans = load_gt_humans(self.ROOT, 1, "000000")
        joints = np.load(str(self.ROOT / "human_name_to_3D_joints" / "1_GT_True.npz"),
                         allow_pickle=True)["arr_0"].item()["000000"]
        assert set(humans) == set(joints)
        for name in humans:
            np.testing.assert_allclose(humans[name], np.asarray(joints[name]), atol=1e-6)

    def test_process_take_from_gt_artifacts(self, tmp_path):
        from or4d_tpu.pipeline.instance_labels import process_take

        n = process_take(self.ROOT, 1, from_gt=True, out_root=tmp_path)
        assert n == 2
        for pcd_idx in ("000000", "000001"):
            p = tmp_path / "instance_labels" / f"1_{pcd_idx}.npz"
            assert p.exists(), p
            labels = np.load(str(p))["arr_0"]
            present = set(np.unique(labels))
            # humans and the operating table must be found
            assert OBJECT_LABEL_MAP["operating_table"] in present
            assert OBJECT_LABEL_MAP["Patient"] in present
            assert -1 in present
        jp = tmp_path / "human_name_to_3D_joints" / "1_GT_True.npz"
        assert jp.exists()
        by_scan = np.load(str(jp), allow_pickle=True)["arr_0"].item()
        assert set(by_scan) == {"000000", "000001"}
        assert "Patient" in by_scan["000000"]
        assert np.asarray(by_scan["000000"]["Patient"]).shape == (14, 3)

    def test_gt_labels_roughly_match_fixture_gt(self, tmp_path):
        """The recomputed GT labels must substantially agree with the
        fixture's shipped instance_labels on human points."""
        from or4d_tpu.pipeline.instance_labels import process_take

        process_take(self.ROOT, 4, from_gt=True, out_root=tmp_path)
        got = np.load(str(tmp_path / "instance_labels" / "4_000000.npz"))["arr_0"]
        want = np.load(str(self.ROOT / "instance_labels" / "4_000000.npz"))["arr_0"]
        got = got[: len(want)]
        for name in ("Patient", "human_0", "human_1"):
            idx = OBJECT_LABEL_MAP[name]
            gt_pts = want == idx
            if gt_pts.sum() == 0:
                continue
            agree = (got[gt_pts] == idx).mean()
            assert agree > 0.5, (name, agree)
