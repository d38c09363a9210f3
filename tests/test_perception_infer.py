"""Interchange-format tests for the L1 inference drivers."""

import numpy as np
import jax
import jax.numpy as jnp

from or4d_tpu.models import groupfree
from or4d_tpu.pipeline import perception_infer as pi


class TestFormats:
    def test_2d_pose_npz_roundtrip(self, tmp_path):
        """Reference dump format: ONE pickled dict under arr_0, read via
        np.load(...)['arr_0'].item() (voxelpose OR_4D.py:113-115)."""
        key = "1_camera03_colorimage-000123.jpg"
        data = {key: np.random.default_rng(0).random((2, 14, 3))}
        p = tmp_path / "pred_or_4d_hrnet_coco_val.npz"
        pi.write_2d_pose_npz(p, data)
        loaded = np.load(p, allow_pickle=True)["arr_0"].item()
        np.testing.assert_allclose(loaded[key], data[key])

    def test_boxes_npz_format(self, tmp_path):
        model = groupfree.GroupFreeDetector(num_proposal=8, num_decoder_layers=1, width=1)
        pc = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4096, 3)).astype(np.float32))
        mean_sizes = np.ones((4, 3), np.float32)
        variables = model.init(jax.random.key(0), pc, jnp.asarray(mean_sizes), train=False)
        out_path = tmp_path / "2_000001.npz"
        result = pi.infer_boxes(model, variables, np.asarray(pc[0]), mean_sizes, out_path, score_threshold=0.0)
        # reference dump keys (ap_helper.py:309-314) + read pattern
        # (compute_instance_labels.py:158-162)
        loaded = pi.load_boxes_npz(out_path)
        assert set(loaded) == {"bboxes", "scores", "classes", "classes_nms", "bboxes_nms", "scores_nms"}
        assert loaded["bboxes_nms"].shape[1] == 7
        assert len(loaded["classes_nms"]) == len(loaded["scores_nms"]) == len(loaded["bboxes_nms"])
        np.testing.assert_allclose(loaded["bboxes_nms"], result["bboxes_nms"])

    def test_boxes_feed_instance_labels(self, tmp_path):
        """The npz output must plug straight into the L2 stage."""
        from or4d_tpu.pipeline.instance_labels import compute_instance_labels_for_scan

        boxes = {
            "classes_nms": np.array([1]),
            "bboxes_nms": np.array([[0.0, 0.0, 0.0, 0.4, 0.4, 0.4, 0.2]]),
            "scores_nms": np.array([0.9]),
        }
        p = tmp_path / "7_000002.npz"
        np.savez_compressed(p, boxes)
        loaded = pi.load_boxes_npz(p)
        pts = np.random.default_rng(1).uniform(-300, 300, size=(2000, 3))
        labels = compute_instance_labels_for_scan(
            pts, boxes={"classes": loaded["classes_nms"], "bboxes": loaded["bboxes_nms"], "scores": loaded["scores_nms"]}
        )
        assert labels.shape == (2000,)
        assert (labels == 1).any()  # operating_table points labeled
