"""Graphormer role-model tests: preprocessing parity with the reference
chain (star expansion, wrapper offsets, collator padding) and model forward."""

import numpy as np
import jax
import pytest

from or4d_tpu.models.graphormer import Graphormer, GraphormerBatch, NEG_INF
from or4d_tpu.pipeline.role_graphormer import (
    MAX_NODE,
    collate_track,
    node_name_to_id,
    preprocess_graph,
    star_expand,
    track_to_batch,
)

RELS = [
    ("human_0", "Assisting", "human_1"),
    ("human_1", "Sawing", "Patient"),
    ("Patient", "LyingOn", "operating_table"),
]


class TestStarExpansion:
    def test_star_graph_structure(self):
        g = star_expand(RELS, target_name="human_1")
        # nodes: human_0, TARGET, Patient, operating_table + 3 relation nodes
        assert len(g.node_ids) == 7
        assert g.edge_index.shape == (6, 2)
        assert g.is_target.sum() == 1
        # relation nodes map through the 22-id vocab
        assert node_name_to_id("$_Sawing_1") == 20
        assert node_name_to_id("TARGET") == 8
        assert node_name_to_id("human_5") == 7
        assert node_name_to_id("Patient") == 7

    def test_empty_returns_none(self):
        assert star_expand([], None) is None

    def test_rename_both_positions(self):
        g = star_expand([("human_0", "CloseTo", "human_0")], target_name="human_0")
        assert g.is_target.sum() == 1  # renamed consistently, one TARGET node


class TestPreprocess:
    def test_wrapper_offsets_and_degrees(self):
        g = star_expand(RELS, target_name="human_1")
        item = preprocess_graph(g)
        # node ids +1 (convert_to_single_emb)
        assert item["x"].min() >= 2
        # star edges: every relation node has in=1 out=1; spatial_pos diagonal 0
        assert (np.diag(item["spatial_pos"]) == 0).all()
        # attn_edge_type on edges = 3 (edge_attr 1 + conv +1 + 1)
        ei = g.edge_index
        assert (item["attn_edge_type"][ei[:, 0], ei[:, 1]] == 3).all()
        # sub -> relnode -> obj gives spatial distance 2 between sub and obj
        subj = np.where(item["x"] == node_name_to_id("human_0") + 1)[0]
        assert item["spatial_pos"][ei[0, 0], ei[1, 1]] in (1, 2, 12)

    def test_collate_padding(self):
        g = star_expand(RELS, target_name="human_1")
        item = preprocess_graph(g)
        batch = collate_track([item, None], max_graphs=3)
        assert batch.x.shape == (3, MAX_NODE)
        n = len(item["x"])
        # +1 pad offset on everything id-like
        np.testing.assert_array_equal(batch.x[0, :n], item["x"] + 1)
        assert (batch.x[0, n:] == 0).all()
        assert (batch.x[1:] == 0).all()
        # pad graphs: node attention blocked, virtual token finite
        assert batch.attn_bias[2, 0, 0] == 0.0
        assert (batch.attn_bias[2, :, 1:] == NEG_INF).all()
        assert batch.is_target[0, :n].max() == 2

    def test_track_to_batch(self):
        b = track_to_batch([RELS, RELS[:1], []], ["human_1", "human_0", None], max_graphs=4)
        assert b.x.shape[0] == 4
        assert (b.is_target == 2).sum() >= 1


class TestGraphormerModel:
    @pytest.fixture(scope="class")
    def setup(self):
        batch = track_to_batch([RELS, RELS[:2]], ["human_1", "human_1"], max_graphs=2)
        model = Graphormer(n_layers=2, hidden=16, ffn=16, heads=4)
        variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, train=False)
        return model, variables, batch

    def test_forward_shape(self, setup):
        model, variables, batch = setup
        logits = model.apply(variables, batch, train=False)
        assert logits.shape == (5,)
        assert np.isfinite(np.asarray(logits)).all()

    def test_padding_graph_invariance(self, setup):
        """Adding an empty padded graph must not change the logits."""
        model, variables, _ = setup
        b1 = track_to_batch([RELS], ["human_1"], max_graphs=1)
        b2 = track_to_batch([RELS], ["human_1"], max_graphs=3)
        l1 = np.asarray(model.apply(variables, b1, train=False))
        l2 = np.asarray(model.apply(variables, b2, train=False))
        np.testing.assert_allclose(l1, l2, atol=1e-5)

    def test_grad_flows(self, setup):
        model, variables, batch = setup

        def loss(params):
            logits = model.apply({"params": params}, batch, train=False)
            return -jax.nn.log_softmax(logits)[1]

        g = jax.grad(loss)(variables["params"])
        total = sum(float(np.abs(np.asarray(x)).sum()) for x in jax.tree_util.tree_leaves(g))
        assert total > 0


class TestRoleInterchangeFormat:
    """The Graphormer role writer must emit the same
    {"{take}_{scan}": {human_name: role}} contract as the heuristic writer
    (reference output_role_predictions :211-251), so the phases stage can
    consume either."""

    @pytest.fixture(scope="class")
    def predictions(self):
        from or4d_tpu.pipeline.role_dataset import make_synthetic_role_take
        from or4d_tpu.pipeline.roles_heuristic import predict_roles_for_take
        from or4d_tpu.train.graphormer_trainer import GraphormerTrainer

        take_idx = 1
        tracks, frame_to_relations, data = make_synthetic_role_take(take_idx, n_frames=3, max_graphs=3)
        trainer = GraphormerTrainer(n_layers=2, hidden=16, ffn=16, heads=4)
        state = trainer.init_state(jax.random.key(0), data[0][0])
        state, _ = trainer.fit(state, data, epochs=1)
        scores = {t.track_idx: trainer.score_track(state, b) for t, (b, _l) in zip(tracks, data)}
        assign_tracks = [{"timestamp_to_human_pose": t.timestamp_to_human_pose} for t in tracks]
        return predict_roles_for_take(take_idx, assign_tracks, frame_to_relations, scores), frame_to_relations

    def test_format_matches_heuristic_writer(self, predictions):
        from or4d_tpu.pipeline.roles_heuristic import ROLE_LABEL_NAMES

        preds, frame_to_relations = predictions
        assert set(preds) == {f"1_{f}" for f in frame_to_relations}
        for frame_key, humans in preds.items():
            assert isinstance(humans, dict)
            for human, role in humans.items():
                assert human.startswith("human_")
                assert role in ROLE_LABEL_NAMES
        # greedy unique assignment: no role repeats within a frame
        for humans in preds.values():
            roles = list(humans.values())
            assert len(roles) == len(set(roles))

    def test_phases_consumes_graphormer_roles(self, predictions, tmp_path):
        import json as _json

        from or4d_tpu.pipeline.phases import recognize_phases

        preds, frame_to_relations = predictions
        # round-trip through json like the CLI does
        p = tmp_path / "graphormer_based_role_predictions.json"
        p.write_text(_json.dumps(preds))
        roles = _json.loads(p.read_text())
        scan_relations = {f"1_{f}": rels for f, rels in frame_to_relations.items()}
        phases = recognize_phases(scan_relations, roles)
        assert isinstance(phases, dict)

    def test_eval_role_prediction_perf(self, predictions):
        from or4d_tpu.pipeline.roles_heuristic import eval_role_prediction_perf

        preds, frame_to_relations = predictions
        # synthesize GT scans agreeing with an oracle assignment
        gt_scans = []
        for f in frame_to_relations:
            gt_scans.append({
                "scan": f,
                "objects": {"1": "human_0"},
                "human_idx_to_name": {f"human_{i}": r for i, r in enumerate(
                    ["Patient", "head-surgeon", "assistant-surgeon", "circulating-nurse", "anaesthetist"])},
            })
        per_take, overall = eval_role_prediction_perf({1: gt_scans}, preds)
        assert 1 in per_take
        assert 0.0 <= overall.macro_f1 <= 1.0

    def test_unscored_track_gets_default_guess(self):
        from or4d_tpu.pipeline.roles_heuristic import DEFAULT_GUESS, assign_roles_in_frame

        tracks = [{"timestamp_to_human_pose": {"000000": ("human_0", np.zeros((14, 3)))}}]
        roles, _ = assign_roles_in_frame("000000", tracks, {})
        best = max(DEFAULT_GUESS.items(), key=lambda x: x[1])[0]
        assert roles == {"human_0": best}


class TestCheckpointResume:
    """Reference auto-resume (entry.py:95-107): fit saves per epoch; a second
    invocation restores and reproduces scores without training."""

    def test_fit_saves_and_restore_reproduces_scores(self, tmp_path):
        import functools

        from or4d_tpu.pipeline.role_dataset import make_synthetic_role_take
        from or4d_tpu.train import checkpoint as ckpt
        from or4d_tpu.train.graphormer_trainer import GraphormerTrainer

        _tracks, _f2r, data = make_synthetic_role_take(1, n_frames=3, max_graphs=3)
        trainer = GraphormerTrainer(n_layers=2, hidden=16, ffn=16, heads=4)
        state = trainer.init_state(jax.random.key(0), data[0][0])
        cdir = tmp_path / "gck"
        state, _ = trainer.fit(state, data, epochs=2, checkpoint_dir=cdir)
        assert ckpt.latest_step(cdir) == 1  # one save per epoch, last wins

        fresh = trainer.init_state(jax.random.key(1), data[0][0])
        restored = ckpt.restore(cdir, fresh)
        for b, _l in data:
            a = trainer.score_track(state, b)
            r = trainer.score_track(restored, b)
            assert a == r

    def test_cli_second_invocation_skips_training(self, tmp_path, monkeypatch, capsys):
        import functools
        import json as _json

        from or4d_tpu import cli
        from or4d_tpu.train import graphormer_trainer as gt

        monkeypatch.setattr(
            gt, "GraphormerTrainer",
            functools.partial(gt.GraphormerTrainer, n_layers=2, hidden=16, ffn=16, heads=4),
        )
        monkeypatch.chdir(tmp_path)
        argv = ["graphormer-roles", "--epochs", "1", "--seed", "0",
                "--checkpoint-dir", str(tmp_path / "ck"),
                "--output", str(tmp_path / "roles.json"),
                "--data-root", str(tmp_path / "nodata")]
        assert cli.main(argv) == 0
        first = _json.loads((tmp_path / "roles.json").read_text())
        capsys.readouterr()
        assert cli.main(argv) == 0
        out = capsys.readouterr().out
        assert "skipping training" in out
        second = _json.loads((tmp_path / "roles.json").read_text())
        assert first == second
