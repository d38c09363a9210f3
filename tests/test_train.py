"""Training subsystem tests: metrics vs sklearn, a real multi-device training
run on the virtual 8-CPU mesh (loss must decrease), checkpoint round-trip,
and the scan_relations output contract."""

import numpy as np
import jax
import pytest

from or4d_tpu.config import DatasetConfig, ExperimentConfig, TPUConfig
from or4d_tpu.data.synthetic import make_scene_batch
from or4d_tpu.data.vocab import DEFAULT_VOCAB
from or4d_tpu.train.loop import Trainer
from or4d_tpu.train.metrics import RelationMetricAccumulator, classification_report

TINY = DatasetConfig(
    num_points_objects=96, num_points_relation=128, max_objects=4, max_edges=12,
    data_augmentation=False,  # augmentation has its own tests; keep the
    # sharded train-step compile cheap on the CPU mesh
)


def tiny_cfg(**tpu_kw):
    from or4d_tpu.config import ModelConfig

    return ExperimentConfig(
        dataset=TINY,
        lr=1e-3,
        model=ModelConfig(sa_npoints=(32, 16), sa_nsamples=((4, 8), (8, 8))),
        # donate_state=False: tests share one state fixture across steps
        tpu=TPUConfig(scene_batch=2, donate_state=False, **tpu_kw),
    )


class TestMetrics:
    def test_matches_sklearn(self):
        from sklearn.metrics import classification_report as sk_report

        rng = np.random.default_rng(0)
        labels = list("abcde")
        y_true = rng.integers(0, 5, 200)
        y_pred = rng.integers(0, 5, 200)
        got = classification_report(y_true, y_pred, labels)
        want = sk_report(y_true, y_pred, labels=range(5), target_names=labels, output_dict=True, zero_division=0)
        for i, l in enumerate(labels):
            np.testing.assert_allclose(got.precision[i], want[l]["precision"], atol=1e-9)
            np.testing.assert_allclose(got.recall[i], want[l]["recall"], atol=1e-9)
            np.testing.assert_allclose(got.f1[i], want[l]["f1-score"], atol=1e-9)
        np.testing.assert_allclose(got.macro_f1, want["macro avg"]["f1-score"], atol=1e-9)
        np.testing.assert_allclose(got.weighted_f1, want["weighted avg"]["f1-score"], atol=1e-9)

    def test_accumulator_per_take(self):
        acc = RelationMetricAccumulator(["a", "b", "none"])
        acc.update(1, np.array([0, 1]), np.array([0, 0]))
        acc.update(2, np.array([1]), np.array([1]))
        reports = acc.per_take_reports()
        assert set(reports) == {1, 2}
        assert reports[2].f1[1] == 1.0
        assert 0 < acc.macro_f1 <= 1.0

    def test_multi_hot_reduction_symmetric_none(self):
        """MULTI_REL_OUTPUTS reduction must be symmetric: sigmoid predictions
        below the 0.5 threshold on every relation reduce to 'none' exactly
        like all-zero GT rows — a plain argmax could never predict 'none'
        (its bit is never set in training targets), zeroing its recall."""
        from types import SimpleNamespace

        names = list(DEFAULT_VOCAB.relation_names)
        none_idx = DEFAULT_VOCAB.none_index
        R = len(names)
        r_a, r_b = [i for i in range(R) if i != none_idx][:2]
        gt = np.zeros((1, 3, R), np.float32)
        gt[0, 0, r_a] = 1.0
        gt[0, 2, r_b] = 1.0  # edge 1 stays all-zero -> GT 'none'
        probs = np.zeros((1, 3, R), np.float32)
        probs[0, 0, r_a] = 0.9  # confident hit
        probs[0, 1, :] = 0.2    # sub-threshold everywhere -> pred 'none'
        probs[0, 2, r_b] = 0.4  # sub-threshold -> pred 'none' (a miss)
        batch = SimpleNamespace(gt_rels=gt, edge_mask=np.ones((1, 3), bool), take_idxs=(0,))
        acc = RelationMetricAccumulator(names)
        acc.update_batch(batch, probs)
        assert acc.take_preds[0] == [r_a, none_idx, none_idx]
        assert acc.take_gts[0] == [r_a, none_idx, r_b]


@pytest.fixture(scope="module")
def trainer_and_state():
    cfg = tiny_cfg()
    trainer = Trainer(cfg, DEFAULT_VOCAB, np.ones(12, np.float32), np.ones(15, np.float32))
    batch = make_scene_batch(2, seed=0, n_objects=3, ds=TINY, points_per_obj=150)
    state = trainer.init_state(jax.random.key(0), batch)
    return trainer, state, batch


class TestTrainLoop:
    def test_mesh_uses_all_devices(self, trainer_and_state):
        trainer, _, _ = trainer_and_state
        assert trainer.mesh.devices.size == jax.device_count() == 8

    def test_loss_decreases(self, trainer_and_state):
        trainer, state, batch = trainer_and_state
        losses = []
        rng = jax.random.key(1)
        for i in range(12):
            rng, key = jax.random.split(rng)
            state, parts, _ = trainer.train_step(state, batch, key)
            losses.append(float(parts["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses

    def test_eval_and_predict_contract(self, trainer_and_state):
        trainer, state, batch = trainer_and_state
        f1 = trainer.evaluate(state, [batch])
        assert 0.0 <= f1 <= 1.0
        rels = trainer.predict_relations(state, [batch])
        assert set(rels) == set(batch.scan_ids)
        for scan_id, triplets in rels.items():
            for sub, rel, obj in triplets:
                assert rel in DEFAULT_VOCAB.relation_names and rel != "none"
                assert isinstance(sub, str) and isinstance(obj, str)

    def test_remat_step_matches_plain(self, trainer_and_state):
        """TPUConfig.remat (jax.checkpoint over the train forward) is exact:
        one step from the same state produces the same loss, params, and
        batch_stats — remat only changes WHEN activations are (re)computed,
        never what is computed."""
        trainer, state, batch = trainer_and_state
        cfg_r = tiny_cfg(remat=True)
        trainer_r = Trainer(cfg_r, DEFAULT_VOCAB, np.ones(12, np.float32), np.ones(15, np.float32))
        key = jax.random.key(7)
        s_plain, parts_plain, _ = trainer.train_step(state, batch, key)
        s_remat, parts_remat, _ = trainer_r.train_step(state, batch, key)
        np.testing.assert_allclose(
            float(parts_plain["loss"]), float(parts_remat["loss"]), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s_plain.params),
                        jax.tree_util.tree_leaves(s_remat.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s_plain.batch_stats),
                        jax.tree_util.tree_leaves(s_remat.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_checkpoint_roundtrip(self, trainer_and_state, tmp_path):
        from or4d_tpu.train import checkpoint as ckpt

        trainer, state, batch = trainer_and_state
        d = tmp_path / "ckpts"
        ckpt.save(d, state, step=3)
        assert ckpt.latest_step(d) == 3
        restored = ckpt.restore(d, state)
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestMultiRelOutputs:
    """MULTI_REL_OUTPUTS wired end-to-end: multi-hot GT from prep, sigmoid
    relation head, weighted BCE (reference PointNetRelClsMulti
    network_PointNet.py:274-318 + data_preparation_utils.py:141-190)."""

    def test_train_step_with_bce_loss_decreases(self):
        import dataclasses

        from or4d_tpu.config import ModelConfig

        cfg = ExperimentConfig(
            dataset=TINY, lr=1e-3,
            model=ModelConfig(sa_npoints=(32, 16), sa_nsamples=((4, 8), (8, 8)),
                              multi_rel_outputs=True),
            tpu=TPUConfig(scene_batch=2, donate_state=False, mesh_data=1, mesh_model=1),
        )
        batch = make_scene_batch(2, seed=8, n_objects=4, ds=TINY,
                                 points_per_obj=150, multi_rel=True)
        gt = np.asarray(batch.gt_rels)
        assert gt.ndim == 3 and gt.shape[-1] == DEFAULT_VOCAB.num_relations
        assert set(np.unique(gt)) <= {0.0, 1.0} and gt.sum() > 0
        # multi-hot has NO default 'none' bit (reference :158: zeros default)
        assert gt[..., DEFAULT_VOCAB.none_index].sum() == 0

        trainer = Trainer(cfg, DEFAULT_VOCAB, np.ones(12, np.float32), np.ones(15, np.float32))
        assert trainer.model.multi_rel_outputs  # from_config wiring
        state = trainer.init_state(jax.random.key(0), batch)
        rng = jax.random.key(1)
        losses = []
        for _ in range(8):
            rng, key = jax.random.split(rng)
            state, parts, rel_out = trainer.train_step(state, batch, key)
            losses.append(float(parts["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-2:]) < np.mean(losses[:2]), losses
        # head emits sigmoid probabilities, not log-softmax
        out = np.asarray(rel_out)
        assert (out >= 0).all() and (out <= 1).all()
        # metrics reduce the multi-hot to labels without crashing
        acc = RelationMetricAccumulator(list(DEFAULT_VOCAB.relation_names))
        acc.update_batch(batch, out)
        assert 0.0 <= acc.macro_f1 <= 1.0

    def test_bce_matches_torch(self):
        import torch

        from or4d_tpu.models.sgpn import weighted_bce

        rng = np.random.default_rng(0)
        probs = rng.uniform(0.02, 0.98, (2, 6, 5)).astype(np.float32)
        gt = (rng.uniform(size=(2, 6, 5)) < 0.3).astype(np.float32)
        w = rng.uniform(0.5, 2.0, 5).astype(np.float32)
        mask = np.ones((2, 6), np.float32)
        got = float(weighted_bce(jax.numpy.asarray(probs), jax.numpy.asarray(gt),
                                 jax.numpy.asarray(w), jax.numpy.asarray(mask)))
        want = float(torch.nn.functional.binary_cross_entropy(
            torch.from_numpy(probs), torch.from_numpy(gt),
            weight=torch.from_numpy(w)))
        assert abs(got - want) < 1e-6

    def test_predict_relations_multilabel_threshold(self):
        """Infer with MULTI_REL_OUTPUTS: each relation thresholds at 0.5 per
        edge (3DSSG-lineage multi-label decision) — an edge can emit several
        relations or none; argmax over sigmoid probs would force exactly one
        spurious relation onto every valid edge."""
        from or4d_tpu.config import ModelConfig

        cfg = ExperimentConfig(
            dataset=TINY, lr=1e-3,
            model=ModelConfig(sa_npoints=(32, 16), sa_nsamples=((4, 8), (8, 8)),
                              multi_rel_outputs=True),
            tpu=TPUConfig(scene_batch=1, donate_state=False, mesh_data=1, mesh_model=1),
        )
        trainer = Trainer(cfg, DEFAULT_VOCAB, np.ones(12, np.float32), np.ones(15, np.float32))
        batch = make_scene_batch(1, seed=8, n_objects=3, ds=TINY,
                                 points_per_obj=150, multi_rel=True)
        R = DEFAULT_VOCAB.num_relations
        none_idx = DEFAULT_VOCAB.none_index
        r_a, r_b = [i for i in range(R) if i != none_idx][:2]
        E = np.asarray(batch.edge_mask).shape[1]
        em = np.asarray(batch.edge_mask[0])
        assert em[0]  # first edge slot is valid for 3 objects
        probs = np.zeros((1, E, R), np.float32)
        probs[0, 0, r_a] = 0.9  # edge 0: two co-occurring relations
        probs[0, 0, r_b] = 0.7
        probs[0, 0, none_idx] = 0.8  # 'none' is dropped even above threshold
        # every other edge: sub-threshold everywhere -> no relation emitted
        trainer.eval_step = lambda state, b: (probs, None)
        rels = trainer.predict_relations(None, [batch])
        got = rels[batch.scan_ids[0]]
        names = batch.slot_names[0]
        ei = np.asarray(batch.edge_index[0])
        rn = DEFAULT_VOCAB.relation_names
        sub, obj = names[ei[0, 0]], names[ei[0, 1]]
        assert (sub, rn[r_a], obj) in got and (sub, rn[r_b], obj) in got
        assert len(got) == 2
