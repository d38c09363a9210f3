"""L1 perception model tests: VoxelPose projection geometry + nets,
Group-Free detector shapes, box decoding, NMS, AP evaluation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from or4d_tpu.models import groupfree, voxelpose


class TestProjection:
    def test_project_points_pinhole(self):
        R = jnp.eye(3)
        T = jnp.zeros(3)
        f = jnp.array([100.0, 100.0])
        c = jnp.array([50.0, 50.0])
        pts = jnp.array([[0.0, 0.0, 2.0], [1.0, 0.0, 2.0]])
        uv = np.asarray(voxelpose.project_points(pts, R, T, f, c))
        np.testing.assert_allclose(uv[0], [50, 50], atol=1e-5)
        np.testing.assert_allclose(uv[1], [100, 50], atol=1e-5)

    def test_compute_grid(self):
        g = np.asarray(voxelpose.compute_grid((100, 100, 100), (0, 0, 0), (5, 5, 5)))
        assert g.shape == (125, 3)
        np.testing.assert_allclose(g.min(0), [-50, -50, -50])
        np.testing.assert_allclose(g.mean(0), [0, 0, 0], atol=1e-5)

    def test_bilinear_sample_peak(self):
        hm = np.zeros((1, 8, 8), np.float32)
        hm[0, 3, 5] = 1.0
        v = np.asarray(voxelpose.bilinear_sample(jnp.asarray(hm), jnp.array([[5.0, 3.0], [0.0, 0.0]])))
        np.testing.assert_allclose(v[0], [1.0, 0.0], atol=1e-6)

    def test_cube_peak_at_projected_point(self):
        """A heatmap peak at a known 3D point's projection produces a cube
        peak at that point's voxel."""
        world = np.array([500.0, 200.0, 0.0])
        # two cameras with orthogonal viewing rays (one camera cannot resolve
        # depth: the fused cube is constant along its ray)
        R1 = np.eye(3)
        T1 = np.array([0.0, 0.0, -5000.0])  # looking +z
        R2 = np.array([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
        T2 = np.array([-5000.0, 0.0, 0.0])  # looking +x
        f = np.array([500.0, 500.0])
        c = np.array([64.0, 64.0])
        hm = np.zeros((2, 1, 128, 128), np.float32)
        yy, xx = np.mgrid[0:128, 0:128]
        for ci, (R, T) in enumerate([(R1, T1), (R2, T2)]):
            uv = np.asarray(
                voxelpose.project_points(jnp.asarray(world[None]), jnp.asarray(R), jnp.asarray(T), jnp.asarray(f), jnp.asarray(c))
            )[0]
            # gaussian blob (real 2D pose heatmaps are blurred; a single hot
            # pixel is sharper than the ~100mm voxel pitch)
            hm[ci, 0] = np.exp(-((xx - uv[0]) ** 2 + (yy - uv[1]) ** 2) / (2 * 6.0**2))
        cams = {
            "R": jnp.asarray(np.stack([R1, R2])),
            "T": jnp.asarray(np.stack([T1, T2])),
            "f": jnp.asarray(np.stack([f, f])),
            "c": jnp.asarray(np.stack([c, c])),
            "size": jnp.asarray(np.array([[128.0, 128.0]] * 2)),
        }
        grid = voxelpose.compute_grid((4000, 4000, 4000), (0, 200, 0), (40, 40, 40))
        cube = np.asarray(
            voxelpose.project_heatmaps_to_cube(jnp.asarray(hm), cams, grid, jnp.asarray([1.0, 1.0]))
        )[0]
        gridn = np.asarray(grid)
        # the voxel nearest the world point sees both camera peaks -> high
        near = np.linalg.norm(gridn - world, axis=1).argmin()
        assert cube[near] > 0.5
        # a voxel far from both rays is ~0
        far = np.linalg.norm(gridn - np.array([-1500.0, 1500.0, 1500.0]), axis=1).argmin()
        assert cube[far] < 0.05
        # note: voxels visible to only ONE camera can score higher than the
        # triangulated point (the reference's bounded average divides by the
        # in-view camera count) — V2V learns to disambiguate; no assertion
        # on the global argmax here.


class TestVoxelPoseNets:
    def test_v2v_shapes(self):
        net = voxelpose.V2VNet(out_channels=1)
        x = jnp.zeros((1, 16, 16, 16, 14))
        v = net.init(jax.random.key(0), x, train=False)
        y = net.apply(v, x, train=False)
        assert y.shape == (1, 16, 16, 16, 1)

    def test_nms_topk(self):
        cube = np.zeros((20, 20, 20), np.float32)
        cube[5, 5, 5] = 0.9
        cube[5, 5, 6] = 0.8  # suppressed (adjacent to a bigger peak)
        cube[15, 2, 9] = 0.7
        vals, idx = voxelpose.nms_topk(jnp.asarray(cube), 3)
        vals, idx = np.asarray(vals), np.asarray(idx)
        assert vals[0] == pytest.approx(0.9)
        np.testing.assert_array_equal(idx[0], [5, 5, 5])
        assert vals[1] == pytest.approx(0.7)
        np.testing.assert_array_equal(idx[1], [15, 2, 9])

    def test_voxel_to_world_roundtrip(self):
        loc = np.asarray(voxelpose.voxel_to_world(jnp.asarray([[0, 0, 0], [79, 79, 79]])))
        np.testing.assert_allclose(loc[0], np.asarray(voxelpose.SPACE_CENTER) - 4000, atol=1e-3)
        np.testing.assert_allclose(loc[1], np.asarray(voxelpose.SPACE_CENTER) + 4000, atol=1e-3)

    def test_loss_per_proposal_matching(self):
        """filter_proposal semantics: each PROPOSAL takes its nearest GT
        (two proposals may share one GT); proposals >500mm from every GT
        are dropped from the loss."""
        # two GT people 2000mm apart; three proposals: near gt0, near gt0
        # again, and one orphan far from both
        gt_roots = jnp.asarray([[0.0, 0, 0], [2000.0, 0, 0]])
        centers = jnp.asarray([[10.0, 0, 0], [40.0, 0, 0], [5000.0, 0, 0]])
        gt_mask = jnp.ones(2, bool)
        cand2gt, valid = voxelpose.match_proposals_to_gt(centers, gt_roots, gt_mask)
        np.testing.assert_array_equal(np.asarray(cand2gt)[:2], [0, 0])
        np.testing.assert_array_equal(np.asarray(valid), [True, True, False])

        gt = jnp.stack([jnp.ones((14, 3)) * 2.0, jnp.ones((14, 3))])
        pred = jnp.zeros((3, 14, 3))
        vis = jnp.ones((2, 14))
        # both valid proposals matched gt0 (|err| = 2): loss = 2
        loss = float(voxelpose.voxelpose_loss(pred, centers, gt_roots, gt, vis, gt_mask))
        assert loss == pytest.approx(2.0)

    def test_loss_patient_weighting_is_slot_indexed(self):
        """The reference multiplies by PATIENT_WEIGHT when the PROPOSAL
        slot's patient flag is set (is_patient_masks[i, n]) — quirk kept."""
        gt_roots = jnp.asarray([[0.0, 0, 0], [2000.0, 0, 0]])
        centers = jnp.asarray([[0.0, 0, 0], [2000.0, 0, 0]])
        gt_mask = jnp.ones(2, bool)
        gt = jnp.stack([jnp.ones((14, 3)) * 2.0, jnp.ones((14, 3))])
        pred = jnp.zeros((2, 14, 3))
        vis = jnp.ones((2, 14))
        base = float(voxelpose.voxelpose_loss(pred, centers, gt_roots, gt, vis, gt_mask))
        weighted = float(voxelpose.voxelpose_loss(
            pred, centers, gt_roots, gt, vis, gt_mask,
            patient_slot_mask=jnp.array([True, False])))
        # slot 0 (err 2) weighted x4 inside the per-candidate mean:
        # (4*2 + 1)/2 = 4.5 ; base (2+1)/2 = 1.5
        assert base == pytest.approx(1.5)
        assert weighted == pytest.approx(4.5)

    def test_loss_visibility_masks_joints(self):
        gt_roots = jnp.asarray([[0.0, 0, 0]])
        centers = jnp.asarray([[0.0, 0, 0]])
        gt_mask = jnp.ones(1, bool)
        gt = jnp.ones((1, 14, 3)) * 2.0
        pred = jnp.zeros((1, 14, 3))
        vis = jnp.ones((1, 14)).at[0, 7:].set(0.0)  # half the joints invisible
        loss = float(voxelpose.voxelpose_loss(pred, centers, gt_roots, gt, vis, gt_mask))
        assert loss == pytest.approx(1.0)  # mean over ALL joints of vis*|err|


class TestGroupFree:
    @pytest.fixture(scope="class")
    def detector(self):
        model = groupfree.GroupFreeDetector(num_proposal=16, num_decoder_layers=2, width=1)
        pc = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4096, 3)).astype(np.float32))
        mean_sizes = jnp.asarray(np.ones((4, 3), np.float32))
        variables = model.init(jax.random.key(0), pc, mean_sizes, train=False)
        return model, variables, pc, mean_sizes

    def test_forward_shapes(self, detector):
        model, variables, pc, mean_sizes = detector
        out = model.apply(variables, pc, mean_sizes, train=False)
        assert out["seeds_obj_cls_logits"].shape == (1, 1024)
        assert out["last"]["center"].shape == (1, 16, 3)
        assert out["last"]["heading_scores"].shape == (1, 16, 12)
        assert out["last"]["size_residual"].shape == (1, 16, 4, 3)
        assert out["last"]["sem_scores"].shape == (1, 16, 4)
        assert len(out["layers"]) == 2

    def test_decode_boxes(self, detector):
        model, variables, pc, mean_sizes = detector
        out = model.apply(variables, pc, mean_sizes, train=False)
        center, size, heading, cls, score = groupfree.decode_boxes(out["last"], np.ones((4, 3)))
        assert center.shape == (1, 16, 3) and size.shape == (1, 16, 3)
        assert np.asarray(size).min() > 0
        h = np.asarray(heading)
        assert (h <= np.pi + 1e-6).all() and (h >= -np.pi - 1e-6).all()
        s = np.asarray(score)
        assert (s >= 0).all() and (s <= 1).all()


class TestNMSAndAP:
    def test_nms_suppresses_overlaps(self):
        centers = np.array([[0, 0, 0], [0.1, 0, 0], [5, 5, 5]])
        sizes = np.ones((3, 3))
        scores = np.array([0.9, 0.8, 0.7])
        keep = groupfree.nms_3d_samecls(centers, sizes, scores, iou_threshold=0.25)
        assert list(keep) == [0, 2]

    def test_nms_same_class_only(self):
        # overlapping boxes of DIFFERENT classes must both survive (cls_nms)
        centers = np.array([[0, 0, 0], [0.1, 0, 0]])
        sizes = np.ones((2, 3))
        scores = np.array([0.9, 0.8])
        keep = groupfree.nms_3d_samecls(centers, sizes, scores, classes=np.array([0, 1]), iou_threshold=0.25)
        assert sorted(keep) == [0, 1]

    def test_ap_perfect_predictions(self):
        gt = {"s1": [(0, [0, 0, 0], [1, 1, 1], 0.0), (1, [3, 3, 3], [1, 1, 1], 0.3)]}
        pred = {"s1": [(0, [0, 0, 0], [1, 1, 1], 0.0, 0.9), (1, [3, 3, 3], [1, 1, 1], 0.3, 0.8)]}
        aps = groupfree.eval_average_precision(pred, gt)
        assert aps[0] == pytest.approx(1.0)
        assert aps[1] == pytest.approx(1.0)

    def test_ap_false_positive(self):
        gt = {"s1": [(0, [0, 0, 0], [1, 1, 1], 0.0)]}
        pred = {"s1": [(0, [10, 10, 10], [1, 1, 1], 0.0, 0.9), (0, [0, 0, 0], [1, 1, 1], 0.0, 0.5)]}
        aps = groupfree.eval_average_precision(pred, gt)
        assert 0 < aps[0] < 1.0
