"""Data-layer tests: prep semantics, padding invariants, weights, augment,
config round-trip."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from or4d_tpu.config import DatasetConfig, ExperimentConfig, load_config
from or4d_tpu.data.augment import augment_batch
from or4d_tpu.data.prep import calculate_downsample_indices, prepare_scene, zero_mean
from or4d_tpu.data.scene_batch import SceneBatch
from or4d_tpu.data.synthetic import make_raw_scene, make_scene_batch, make_scene_sample
from or4d_tpu.data.vocab import DEFAULT_VOCAB
from or4d_tpu.data.weights import compute_weights

TINY = DatasetConfig(num_points_objects=96, num_points_relation=128, max_objects=6, max_edges=30)


class TestPrep:
    def test_zero_mean_unit_sphere(self):
        pts = np.random.default_rng(0).standard_normal((50, 3)) * 7 + 3
        out, info = zero_mean(pts)
        np.testing.assert_allclose(out.mean(0), 0, atol=1e-9)
        assert abs(np.linalg.norm(out, axis=1).max() - 1.0) < 1e-9

    def test_downsample_exact_count_and_valid(self):
        rng = np.random.default_rng(1)
        pts = rng.standard_normal((500, 6)) * 100
        idx = calculate_downsample_indices(pts, 96, rng)
        assert len(idx) == 96
        assert idx.min() >= 0 and idx.max() < 500
        # undersized input: sampled with replacement
        idx2 = calculate_downsample_indices(pts[:50], 96, rng)
        assert len(idx2) == 96

    def test_prepare_scene_semantics(self):
        rng = np.random.default_rng(2)
        points, instances, objs, rels, hands = make_raw_scene(rng, n_objects=4, points_per_obj=300)
        s = prepare_scene(points, instances, objs, rels, DEFAULT_VOCAB, TINY, rng, hand_locations=hands)
        n = len(objs)
        assert s.num_objects == n
        assert s.num_edges == n * (n - 1)
        # slot order = sorted instance ids; class targets match names
        for slot, inst_id in enumerate(sorted(objs)):
            assert s.slot_names[slot] == objs[inst_id]
            assert s.gt_class[slot] == DEFAULT_VOCAB.class_index(objs[inst_id])
        # every valid edge: gt matches the rel json (last write wins) or none
        id2slot = {inst: i for i, inst in enumerate(sorted(objs))}
        adj = {}
        for r in rels:
            adj[(id2slot[r[0]], id2slot[r[1]])] = DEFAULT_VOCAB.relation_index(r[3])
        for e in range(s.num_edges):
            a, b = s.edge_index[e]
            want = adj.get((int(a), int(b)), DEFAULT_VOCAB.none_index)
            assert s.gt_rels[e] == want
        # mask channel: only 0/1/2 present, crops zero-meaned
        assert set(np.unique(s.rel_points[: s.num_edges, :, 6])) <= {0.0, 1.0, 2.0}
        norms = np.linalg.norm(s.obj_points[0, :, :3], axis=1)
        assert norms.max() <= 1.0 + 1e-5

    def test_one_hot_fusion_layout(self):
        s = make_scene_sample(seed=3, n_objects=4, ds=TINY, points_per_obj=200)
        e0 = s.edge_index[0]
        oh = s.rel_onehot[0]
        assert oh.sum() == 2.0
        assert oh[:6].sum() == 1.0 and oh[6:].sum() == 1.0


class TestSceneBatch:
    def test_stack_and_pytree(self):
        b = make_scene_batch(2, seed=0, n_objects=4, ds=TINY, points_per_obj=200)
        assert b.obj_points.shape[0] == 2
        leaves, treedef = jax.tree_util.tree_flatten(b)
        b2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert b2.scan_ids == b.scan_ids
        np.testing.assert_array_equal(np.asarray(b2.gt_rels), np.asarray(b.gt_rels))


class TestWeights:
    def test_reference_rules(self):
        scans = [
            {
                "take_idx": 1,
                "scan": "000000",
                "objects": {"1": "Patient", "2": "operating_table"},
                "relationships": [[1, 2, 8, "LyingOn"], [2, 1, 3, "CloseTo"], [1, 2, 3, "CloseTo"]],
            }
        ] * 4
        w_obj, w_rel = compute_weights(DEFAULT_VOCAB, scans)
        v = DEFAULT_VOCAB
        np.testing.assert_allclose(w_obj[v.class_index("Patient")], abs(1 / (np.log(4) + 1)), rtol=1e-5)
        assert w_obj[v.class_index("human_0")] == 0  # unseen -> clamped
        np.testing.assert_allclose(w_rel[v.relation_index("LyingOn")], 1 / 4, rtol=1e-6)
        np.testing.assert_allclose(w_rel[v.relation_index("CloseTo")], 1 / 8, rtol=1e-6)
        assert w_rel[v.none_index] == np.float32(1e-4)


class TestAugment:
    def test_shapes_and_rgb_range(self):
        b = make_scene_batch(2, seed=1, n_objects=4, ds=TINY, points_per_obj=200)
        out = augment_batch(jax.random.key(0), b)
        assert out.obj_points.shape == b.obj_points.shape
        assert out.rel_points.shape == b.rel_points.shape
        rgb = np.asarray(out.obj_points)[..., 3:6]
        assert rgb.min() >= 0.0 and rgb.max() <= 1.0
        # gt untouched
        np.testing.assert_array_equal(np.asarray(out.gt_rels), np.asarray(b.gt_rels))

    def test_p075_gate_varies(self):
        b = make_scene_batch(4, seed=2, n_objects=3, ds=TINY, points_per_obj=150)
        out = augment_batch(jax.random.key(123), b)
        changed = [
            not np.allclose(np.asarray(out.obj_points[i]), np.asarray(b.obj_points[i]))
            for i in range(4)
        ]
        assert any(changed)  # p=0.75: overwhelmingly some scene augments


class TestConfig:
    def test_load_reference_json_format(self, tmp_path):
        import json

        raw = {
            "MAX_EPOCHES": 25, "LR": 3e-05, "W_DECAY": 0.001, "USE_GT": False,
            "IMAGE_INPUT": False, "WEIGHTING": True,
            "MODEL": {"N_LAYERS": 2, "point_feature_size": 256, "edge_feature_size": 256,
                      "gcn_hidden_feature_size": 512, "lambda_o": 1e-06,
                      "FULL_IMAGE_EMBEDDING_SIZE": 768, "IMAGE_MODEL": False},
            "dataset": {"root": ["data"], "data_augmentation": True,
                        "num_points_objects": 4000, "num_points_relation": 8000},
        }
        p = tmp_path / "no_gt.json"
        p.write_text(json.dumps(raw))
        cfg = ExperimentConfig.from_reference_json(p)
        assert cfg.max_epochs == 25 and cfg.lr == 3e-5
        assert cfg.model.n_layers == 2 and cfg.model.lambda_o == 1e-6
        assert cfg.dataset.num_points_relation == 8000
        assert cfg.dataset.max_objects == 12 and cfg.dataset.max_edges == 132

    def test_builtin_configs(self):
        c1 = load_config("no_gt")
        c2 = load_config("no_gt_image.json")
        assert c1.image_input is False
        assert c2.image_input == "full" and c2.model.image_model == "tf_efficientnet_b5_ns"
