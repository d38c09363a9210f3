"""End-to-end no-GT chain on the real-format fixture, driven through the CLI.

Closes the last pipeline link the reference exercises with its four conda
envs: raw scans -> L1 inference artifacts (`group_free_predictions/*.npz`,
`OR_4D_outputs/pred_*.npy`) -> L2 pred-mode instance labels -> ORDataset
no-GT object synthesis -> `infer` -> scan_relations json.

Reference contracts covered: get_human_poses_4D_OR.py:41-112 (pose dump),
infer.py:153-226 + ap_helper.py:263-322 (box dump), compute_instance_labels
pred path (:158-200), dataset_loading:52-61 (object-list synthesis).
"""

import functools
import json
import shutil
from pathlib import Path

import numpy as np
import pytest

from or4d_tpu import cli
from or4d_tpu.config import OBJECT_LABEL_MAP

# full-suite lane only: multi-minute on the 1-core runner (pytest.ini)
pytestmark = pytest.mark.slow

FIXTURE = Path(__file__).parent / "golden" / "real_data"


@pytest.fixture()
def root(tmp_path):
    dst = tmp_path / "real_data"
    shutil.copytree(FIXTURE, dst)
    return dst


def _tiny_l1(monkeypatch, tmp_path):
    """Shrink the L1 models/datasets the CLI constructs (same architecture)."""
    from or4d_tpu.data import groupfree_dataset as gfd
    from or4d_tpu.train import perception_trainers as pt

    monkeypatch.setattr(
        pt, "VoxelPoseTrainer",
        functools.partial(
            pt.VoxelPoseTrainer,
            model_kwargs=dict(initial_cube=(12, 12, 12), fine_cube=(8, 8, 8), max_people=3),
        ),
    )
    monkeypatch.setattr(
        pt, "GroupFreeTrainer",
        functools.partial(pt.GroupFreeTrainer, num_proposal=16, num_decoder_layers=1),
    )
    monkeypatch.setattr(
        gfd, "GroupFreeDetectionDataset",
        functools.partial(gfd.GroupFreeDetectionDataset, num_points=2048,
                          cache_dir=tmp_path / "ret_dicts"),
    )


class TestL1InferDrivers:
    def test_detect_infer_cli_writes_reference_npz(self, root, tmp_path, monkeypatch):
        _tiny_l1(monkeypatch, tmp_path)
        assert cli.main([
            "perception", "--task", "detect-infer", "--data-root", str(root),
            "--split", "train", "--seed", "0",
        ]) == 0
        out = sorted((root / "group_free_predictions").glob("*.npz"))
        assert [p.name for p in out] == ["1_000000.npz", "1_000001.npz"]
        from or4d_tpu.pipeline.perception_infer import load_boxes_npz

        loaded = load_boxes_npz(out[0])
        assert set(loaded) == {"bboxes", "scores", "classes", "classes_nms", "bboxes_nms", "scores_nms"}
        assert loaded["bboxes_nms"].shape[1:] == (7,)

    def test_pose3d_infer_driver_writes_reference_npy(self, root, tmp_path, monkeypatch):
        import jax

        from or4d_tpu.data.voxelpose_dataset import VoxelPoseDataset
        from or4d_tpu.pipeline.perception_infer import run_3d_pose_inference_for_take
        from or4d_tpu.train.perception_trainers import VoxelPoseTrainer

        ds = VoxelPoseDataset(root, "train", inference=True)
        tr = VoxelPoseTrainer(model_kwargs=dict(
            initial_cube=(12, 12, 12), fine_cube=(8, 8, 8), max_people=3))
        import jax.numpy as jnp

        cams = {k: jnp.asarray(v) for k, v in ds.cameras.items()}
        hs = jnp.asarray(ds.heatmap_scale)
        state = tr.init_state(jax.random.key(0), jnp.asarray(ds.sample(0)["input_heatmaps"]), cams, hs)
        variables = {"params": state["params"], "batch_stats": state["batch_stats"]}
        out_dir = root / "OR_4D_outputs"
        # threshold -inf: every frame dumps, so the format is always exercised
        n = run_3d_pose_inference_for_take(tr.model, variables, ds, 1, out_dir, threshold=-1e9)
        assert n == len([r for r in ds.db if r["take_idx"] == 1]) > 0
        pose = np.load(out_dir / f"pred_1_{ds.db[0]['pcd_idx']}.npy")
        assert pose.ndim == 3 and pose.shape[1:] == (14, 3)  # (P, J, 3) world

    def test_pose3d_infer_cli_smoke(self, root, tmp_path, monkeypatch):
        _tiny_l1(monkeypatch, tmp_path)
        assert cli.main([
            "perception", "--task", "pose3d-infer", "--data-root", str(root),
            "--split", "train", "--seed", "0",
        ]) == 0
        # random weights may legitimately score every proposal below the
        # reference keep-threshold; any file written must be (P, 14, 3)
        for p in (root / "OR_4D_outputs").glob("pred_*.npy"):
            assert np.load(p).shape[1:] == (14, 3)


def _write_realistic_l1_artifacts(root: Path):
    """Reference-format L1 artifacts with *realistic content*, derived from
    the fixture's GT labels/annotations — this pins the chain's data quality
    so the downstream assertions are about plumbing, not model training."""
    from or4d_tpu.data.pcd_io import read_pcd
    from or4d_tpu.pipeline.instance_labels import load_gt_humans

    boxes_dir = root / "group_free_predictions"
    poses_dir = root / "OR_4D_outputs"
    boxes_dir.mkdir(exist_ok=True)
    poses_dir.mkdir(exist_ok=True)
    detect_ids = {OBJECT_LABEL_MAP[n]: n for n in
                  ("anesthesia_equipment", "operating_table", "instrument_table", "secondary_table")}
    for pcd_path in sorted((root / "export_holistic_take1_processed" / "pcds").glob("*.pcd")):
        pcd_idx = pcd_path.stem
        pts = read_pcd(pcd_path)[:, :3]
        labels = np.load(root / "instance_labels" / f"1_{pcd_idx}.npz")["arr_0"]
        classes, bbs, scores = [], [], []
        for lid, _name in detect_ids.items():
            sel = pts[labels == lid]
            if len(sel) < 10:
                continue
            mn, mx = sel.min(0), sel.max(0)
            # detector output scale: /1000 world (OR_4D_detection_dataset)
            bbs.append(np.concatenate([(mn + mx) / 2, (mx - mn)]) / 1000.0)
            classes.append(lid)
            scores.append(0.9)
        boxes7 = np.concatenate([np.asarray(bbs), np.zeros((len(bbs), 1))], axis=1)
        np.savez_compressed(
            boxes_dir / f"1_{pcd_idx}.npz",
            {"bboxes": boxes7, "scores": np.asarray(scores), "classes": np.asarray(classes),
             "bboxes_nms": boxes7, "scores_nms": np.asarray(scores), "classes_nms": np.asarray(classes)},
        )
        humans = load_gt_humans(root, 1, pcd_idx)
        if humans:
            np.save(poses_dir / f"pred_1_{pcd_idx}.npy", np.stack(list(humans.values())))


class TestNoGTChain:
    def test_pred_labels_to_scan_relations(self, root, tmp_path, capsys):
        _write_realistic_l1_artifacts(root)
        # L2 pred mode: consumes the box npzs + pose npys just written
        assert cli.main(["instance-labels", "--data-root", str(root)]) == 0
        lab = np.load(root / "instance_labels_pred" / "1_000000.npz")["arr_0"]
        assert (lab >= 0).any()
        assert (root / "human_name_to_3D_joints" / "1_GT_False.npz").exists()

        # L3 no-GT inference: object lists synthesized from the pred labels
        cfg = {
            "MAX_EPOCHES": 1, "LR": 1e-3, "USE_GT": False,
            "MODEL": {"sa_npoints": [32, 16], "sa_nsamples": [[4, 8], [8, 8]]},
            "dataset": {"num_points_objects": 96, "num_points_relation": 128,
                        "data_augmentation": False},
            "TPU": {"max_objects": 10, "max_edges": 90, "scene_batch": 2, "donate_state": False},
        }
        cfg_path = tmp_path / "tiny_chain.json"
        cfg_path.write_text(json.dumps(cfg))
        out_json = tmp_path / "scan_relations.json"
        assert cli.main([
            "infer", "--config", str(cfg_path), "--data-root", str(root),
            "--split", "train", "--cache-dir", str(tmp_path / "cache"),
            "--output", str(out_json),
        ]) == 0
        stdout = capsys.readouterr().out
        # loud provenance line: the eval scans must be REAL, not synthetic
        assert "0 synthetic-geometry scans" in stdout
        rels = json.loads(out_json.read_text())
        assert rels, "no scan relations written"
        for scan_id, triplets in rels.items():
            take, scan, _split = scan_id.split("_")
            assert take == "1" and scan in ("000000", "000001")
            for s, r, o in triplets:
                assert isinstance(s, str) and isinstance(r, str) and isinstance(o, str)


class TestProvenance:
    def test_strict_mode_raises_on_missing_raw(self, tmp_path):
        from or4d_tpu.config import TINY
        from or4d_tpu.data.dataset import ORDataset
        from or4d_tpu.data.vocab import DEFAULT_VOCAB

        with pytest.raises(RuntimeError, match="no scans|synthetic_fallback=False"):
            ORDataset(TINY, "val", DEFAULT_VOCAB, data_root=tmp_path / "nodata",
                      cache_dir=tmp_path, synthetic_fallback=False)

    def test_count_line_printed(self, root, tmp_path, capsys):
        from or4d_tpu.config import TINY
        from or4d_tpu.data.dataset import ORDataset
        from or4d_tpu.data.vocab import DEFAULT_VOCAB

        import dataclasses

        cfg = dataclasses.replace(TINY, use_gt=True)
        ORDataset(cfg, "train", DEFAULT_VOCAB, data_root=root, cache_dir=tmp_path)
        out = capsys.readouterr().out
        assert "real /" in out and "synthetic-geometry scans" in out
