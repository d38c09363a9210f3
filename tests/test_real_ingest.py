"""Real-dataset ingest path, end to end on the tests/golden/real_data fixture
(real-format pcds + instance-label npzs + relationship jsons).

Covers load_mesh semantics (dataset_utils.py:65-117): virtual instrument box,
emulated cone for missing objects, hand locations from the per-take joints
npz, chamfer-based human GT<->pred matching, the no-GT eval object-list
synthesis (dataset_loading :52-61), and a short training run over ORDataset
with the raw files as the geometry source.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from or4d_tpu.config import OBJECT_LABEL_MAP, DatasetConfig, ExperimentConfig, ModelConfig, TPUConfig
from or4d_tpu.data import ingest
from or4d_tpu.data.dataset import ORDataset
from or4d_tpu.data.vocab import DEFAULT_VOCAB

ROOT = Path(__file__).parent / "golden" / "real_data"

TINY = DatasetConfig(num_points_objects=96, num_points_relation=128, max_objects=6, max_edges=30,
                     data_augmentation=False)


def tiny_cfg(use_gt=True):
    return ExperimentConfig(
        dataset=TINY, lr=1e-3, use_gt=use_gt,
        model=ModelConfig(sa_npoints=(32, 16), sa_nsamples=((4, 8), (8, 8))),
        tpu=TPUConfig(scene_batch=2, donate_state=False),
    )


def scan_entry(split_file, idx=0):
    return json.load(open(ROOT / split_file))["scans"][idx]


class TestLoadScanGeometry:
    def test_virtual_instrument_box(self):
        scan = scan_entry("relationships_train.json", 0)
        objs = {int(k): v for k, v in scan["objects"].items()}
        pts, inst, hands = ingest.load_scan_geometry(ROOT, 1, "000000", objs, use_gt=True)
        instr_key = next(k for k, v in objs.items() if v == "instrument")
        box_pts = pts[inst == instr_key, :3]
        assert len(box_pts) == ingest.VIRTUAL_POINTS
        lo, hi = ingest.INSTRUMENT_BOX_TRANSLATE, ingest.INSTRUMENT_BOX_TRANSLATE + ingest.INSTRUMENT_BOX_SIZE
        assert (box_pts >= lo - 1e-4).all() and (box_pts <= hi + 1e-4).all()
        np.testing.assert_allclose(pts[inst == instr_key, 3:][0], ingest.INSTRUMENT_COLOR, atol=1e-6)

    def test_emulated_cone_for_missing_object(self):
        scan = scan_entry("relationships_train.json", 1)  # 1_000001: secondary_table missing
        objs = {int(k): v for k, v in scan["objects"].items()}
        pts, inst, _ = ingest.load_scan_geometry(ROOT, 1, "000001", objs, use_gt=True)
        st_key = next(k for k, v in objs.items() if v == "secondary_table")
        cone = pts[inst == st_key, :3]
        assert len(cone) == ingest.VIRTUAL_POINTS  # only the emulated points
        center = ingest.CONE_TRANSLATE
        r = np.linalg.norm(cone[:, :2] - center[:2], axis=1)
        assert (r <= ingest.CONE_RADIUS + 1e-4).all()
        assert (cone[:, 2] >= center[2] - 1e-4).all()
        assert (cone[:, 2] <= center[2] + ingest.CONE_HEIGHT + 1e-4).all()

    def test_hand_locations_from_joints_npz(self):
        scan = scan_entry("relationships_train.json", 0)
        objs = {int(k): v for k, v in scan["objects"].items()}
        joints = ingest.load_human_joints(ROOT, 1, from_gt=True)
        pts, inst, hands = ingest.load_scan_geometry(ROOT, 1, "000000", objs, use_gt=True, human_joints=joints)
        human_keys = [k for k, v in objs.items() if "human" in v or v == "Patient"]
        assert set(hands) == set(human_keys)
        for k in human_keys:
            np.testing.assert_array_equal(hands[k], np.asarray(joints["000000"][objs[k]])[8:10])
            assert hands[k].shape == (2, 3)

    def test_every_listed_object_has_points(self):
        for take, pcd_idx, split_file, i in [(1, "000000", "relationships_train.json", 0),
                                             (1, "000001", "relationships_train.json", 1),
                                             (4, "000000", "relationships_validation.json", 0)]:
            scan = scan_entry(split_file, i)
            objs = {int(k): v for k, v in scan["objects"].items()}
            _, inst, _ = ingest.load_scan_geometry(ROOT, take, pcd_idx, objs, use_gt=True)
            for k in objs:
                assert (inst == k).sum() > 0, (take, pcd_idx, k, objs[k])


class TestHumanMatching:
    def test_pred_identities_remapped_to_gt(self):
        """The fixture's pred labels cyclically permute human ids; matching
        must undo the permutation (fixture humans are far apart)."""
        pts = ingest.pcd_io.read_pcd(ingest.pcd_path(ROOT, 1, "000001"))
        gt = np.load(str(ingest.instance_labels_path(ROOT, 1, "000001")))["arr_0"]
        pred = np.load(str(ingest.instance_labels_path(ROOT, 1, "000001", pred=True)))["arr_0"]
        assert (gt != pred).any()
        fixed = ingest.match_human_labels_to_gt(pts[:, :3], gt, pred, np.random.default_rng(0))
        for name in ingest.HUMAN_NAMES:
            idx = OBJECT_LABEL_MAP[name]
            if (gt == idx).sum() == 0:
                continue
            # the matched blob must overlap the GT blob almost entirely
            # (pred drops ~2% of points to background)
            overlap = ((fixed == idx) & (gt == idx)).sum() / (gt == idx).sum()
            assert overlap > 0.9, (name, overlap)

    def test_unmatched_pred_takes_free_identity(self):
        rng = np.random.default_rng(3)
        xyz = rng.uniform(-100, 100, (300, 3))
        gt = np.full(300, -1, np.int8)
        pred = np.full(300, -1, np.int8)
        gt[:100] = OBJECT_LABEL_MAP["Patient"]
        pred[:100] = OBJECT_LABEL_MAP["human_0"]
        pred[150:200] = OBJECT_LABEL_MAP["human_3"]  # spurious extra human
        fixed = ingest.match_human_labels_to_gt(xyz, gt, pred, rng)
        assert (fixed[:100] == OBJECT_LABEL_MAP["Patient"]).all()
        # leftover blob gets a free identity: the reference loop assigns every
        # free name in order, so the LAST free one wins
        leftover = set(np.unique(fixed[150:200]))
        assert leftover == {OBJECT_LABEL_MAP[ingest.HUMAN_NAMES[-1]]}


class TestORDatasetRealPath:
    def test_samples_come_from_raw_files(self, tmp_path):
        ds = ORDataset(tiny_cfg(), "train", DEFAULT_VOCAB, data_root=ROOT,
                       cache_dir=tmp_path, synthetic_fallback=False)
        assert len(ds.scans) == 2
        s = ds.sample(0)
        names = set(s.slot_names)
        assert "instrument" in names and "Patient" in names
        assert s.obj_mask.sum() == len(json.load(open(ROOT / "relationships_train.json"))["scans"][0]["objects"])
        # LyingOn GT must survive prep
        lying = DEFAULT_VOCAB.relation_index("LyingOn")
        assert (s.gt_rels[s.edge_mask] == lying).sum() >= 1

    def test_train_end_to_end_loss_decreases(self, tmp_path):
        import jax

        from or4d_tpu.train.loop import Trainer

        cfg = tiny_cfg()
        ds = ORDataset(cfg, "train", DEFAULT_VOCAB, data_root=ROOT,
                       cache_dir=tmp_path, synthetic_fallback=False)
        w_obj, w_rel = ds.weights()
        trainer = Trainer(cfg, DEFAULT_VOCAB, w_obj, w_rel)
        batch = next(ds.batches(2))
        state = trainer.init_state(jax.random.key(0), batch)
        losses = []
        rng = jax.random.key(1)
        for _ in range(8):
            rng, key = jax.random.split(rng)
            state, parts, _ = trainer.train_step(state, batch, key)
            losses.append(float(parts["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-2:]) < np.mean(losses[:2]), losses

    def test_no_gt_eval_objects_synthesized_from_pred(self, tmp_path):
        cfg = tiny_cfg(use_gt=False)
        ds = ORDataset(cfg, "val", DEFAULT_VOCAB, data_root=ROOT,
                       cache_dir=tmp_path, for_eval=True, synthetic_fallback=False)
        scan = ds.scans[0]
        assert scan["relationships"] == []
        want = ingest.synthesize_objects_from_pred_labels(ROOT, 4, "000000")
        assert {int(k): v for k, v in scan["objects"].items()} == want
        s = ds.sample(0)
        assert s.obj_mask.sum() == len(want)

    def test_cache_reproducible_across_instances(self, tmp_path):
        cfg = tiny_cfg()
        a = ORDataset(cfg, "train", DEFAULT_VOCAB, data_root=ROOT,
                      cache_dir=tmp_path / "a", synthetic_fallback=False).sample(0)
        b = ORDataset(cfg, "train", DEFAULT_VOCAB, data_root=ROOT,
                      cache_dir=tmp_path / "b", synthetic_fallback=False).sample(0)
        np.testing.assert_array_equal(a.obj_points, b.obj_points)
        np.testing.assert_array_equal(a.rel_points, b.rel_points)
        np.testing.assert_array_equal(a.gt_rels, b.gt_rels)
