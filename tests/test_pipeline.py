"""Downstream pipeline tests: heuristic role prediction and the phase FSM."""

import numpy as np

from or4d_tpu.pipeline.phases import (
    PHASE_ORDER,
    augment_with_roles,
    cond,
    evaluate_phases,
    expand_to_per_frame,
    q,
    recognize_phases,
)
from or4d_tpu.pipeline.roles_heuristic import (
    assign_roles_in_frame,
    collect_track_relations,
    match_human_preds_to_gt,
    predict_roles_for_take,
    scene_graph_to_readable,
    score_track,
)


class TestHeuristicRoles:
    def test_score_track_patient_signal(self):
        rels = [("TARGET", "LyingOn", "operating_table")] * 3
        g = score_track(rels)
        assert max(g, key=g.get) == "Patient"

    def test_score_track_anaesthetist_signal(self):
        rels = [("TARGET", "Operating", "anesthesia_equipment")]
        g = score_track(rels)
        assert max(g, key=g.get) == "anaesthetist"

    def test_score_track_head_surgeon_actions(self):
        rels = [("TARGET", "Sawing", "human"), ("TARGET", "Drilling", "human")]
        g = score_track(rels)
        assert max(g, key=g.get) == "head_surgeon"

    def test_epsilon_ladder_ordering(self):
        g = score_track([])
        order = sorted(g, key=g.get, reverse=True)
        assert order[:2] == ["circulating_nurse", "anaesthetist"]

    def test_normalization(self):
        g = score_track([("TARGET", "LyingOn", "operating_table")] * 10)
        assert abs(sum(g.values()) - 1.0) < 1e-9

    def test_greedy_unique_assignment(self):
        tracks = [
            {"timestamp_to_human_pose": {"000001": ("human_0", np.zeros(3))}},
            {"timestamp_to_human_pose": {"000001": ("human_1", np.ones(3))}},
        ]
        scores = {
            0: {"head_surgeon": 0.9, "assistant_surgeon": 0.5},
            1: {"head_surgeon": 0.8, "assistant_surgeon": 0.7},
        }
        roles, joints = assign_roles_in_frame("000001", tracks, scores)
        assert roles == {"human_0": "head_surgeon", "human_1": "assistant_surgeon"}
        assert set(joints) == {"human_0", "human_1"}

    def test_match_preds_to_gt(self):
        gt = {"human_0": np.zeros((14, 3)), "Patient": np.ones((14, 3)) * 5}
        pred_roles = {"h_a": "head_surgeon", "h_b": "Patient"}
        pred_joints = {"h_a": np.zeros((14, 3)) + 0.1, "h_b": np.ones((14, 3)) * 5.1}
        out = match_human_preds_to_gt(gt, pred_roles, pred_joints)
        assert out == {"human_0": "head_surgeon", "Patient": "Patient"}

    def test_collect_track_relations_renames_target(self):
        track = {"timestamp_to_human_pose": {"000002": ("human_3", np.zeros(3))}}
        frames = {"000002": [("human_3", "Sawing", "Patient"), ("human_1", "CloseTo", "human_2")]}
        rels = collect_track_relations(track, frames)
        assert rels == [("TARGET", "Sawing", "human")]

    def test_predict_roles_for_take_json_contract(self):
        tracks = [{"timestamp_to_human_pose": {"000001": ("human_0", np.zeros(3))}}]
        frames = {"000001": [("human_0", "LyingOn", "operating_table")]}
        out = predict_roles_for_take(4, tracks, frames)
        assert "4_000001" in out
        assert out["4_000001"]["human_0"] == "Patient"

    def test_scene_graph_to_readable(self):
        scan = {
            "objects": {"1": "human_0", "2": "operating_table"},
            "relationships": [[1, 2, 8, "LyingOn"]],
        }
        assert scene_graph_to_readable(scan) == [("human", "LyingOn", "operating_table")]


def synth_take_sgs():
    """A synthetic take that walks through all 8 phases."""
    def frames(rng, rels):
        return {f"{idx:06d}": rels for idx in rng}

    sgs = {}
    sgs.update(frames(range(0, 10), []))  # sterile
    sgs.update(frames(range(10, 16), [("Patient", "CloseTo", "operating_table"), ("circulating_nurse", "Operating", "operating_table")]))
    sgs.update(frames(range(16, 30), [("head_surgeon", "Preparing", "Patient"), ("assistant_surgeon", "Preparing", "Patient")]))
    sgs.update(frames(range(30, 40), [("head_surgeon", "Cleaning", "Patient")]))
    sgs.update(frames(range(40, 50), [("head_surgeon", "Cutting", "Patient")]))
    sgs.update(frames(range(50, 60), [("head_surgeon", "Sawing", "Patient")]))
    sgs.update(frames(range(66, 76), [("head_surgeon", "Hammering", "Patient")]))
    sgs.update(frames(range(76, 86), [("head_surgeon", "Cementing", "Patient")]))
    sgs.update(frames(range(86, 96), [("head_surgeon", "Suturing", "Patient")]))
    sgs.update(frames(range(96, 110), [("Patient", "CloseTo", "operating_table"), ("anaesthetist", "Operating", "operating_table")]))
    sgs.update(frames(range(110, 120), [("circulating_nurse", "Touching", "instrument_table")]))
    return {f"7_{k}": v for k, v in sgs.items()}


class TestPhaseFSM:
    def test_q_and_cond(self):
        rels = [("head_surgeon", "Sawing", "Patient")]
        assert q(rels, s=["head_surgeon"], r=["Sawing"])
        assert not q(rels, o=["operating_table"])
        start, flag = cond([5, 6, 7], window=5, threshold=3)
        assert flag and start == 5
        _, flag = cond([1, 50, 100], window=5, threshold=3)
        assert not flag

    def test_full_phase_walk(self):
        phases = recognize_phases(synth_take_sgs(), role_predictions={})
        assert list(phases) == PHASE_ORDER
        for phase, (start, end) in phases.items():
            assert start <= end

    def test_role_substitution(self):
        rels = [("human_0", "Sawing", "Patient")]
        roles = {"7_000050": {"human_0": "head_surgeon"}}
        out = augment_with_roles(rels, "7_000050", roles)
        assert out == [("head_surgeon", "Sawing", "Patient")]

    def test_expand_and_evaluate(self):
        gt = {"sterile": (0, 9), "roll_in": (10, 19)}
        pred = {"sterile": (0, 14), "roll_in": (15, 19)}
        labels = expand_to_per_frame(gt)
        assert len(labels) == 20 and labels[0] == 0 and labels[15] == 1
        report = evaluate_phases(gt, pred)
        assert 0 < report.macro_f1 < 1

    def test_phases_eval_cli(self, tmp_path, capsys):
        """phases-eval mode: the reference evaluator loop
        (evaluate_surgery_phase_recognition.py:11-49) — GT + predicted phase
        jsons in, per-take and per-split reports out; numbers match sklearn."""
        import json

        from or4d_tpu import cli

        gt_dir = tmp_path / "gt"
        pred_dir = tmp_path / "pred"
        gt_dir.mkdir()
        pred_dir.mkdir()
        gt7 = {"sterile": (0, 9), "roll_in": (10, 19), "patient_prep": (20, 29)}
        pred7 = {"sterile": (0, 14), "roll_in": (15, 19), "patient_prep": (20, 29)}
        gt4 = {"sterile": (0, 5), "roll_in": (6, 11)}
        pred4 = {"sterile": (0, 11)}
        (gt_dir / "phase_to_frames_7.json").write_text(json.dumps(gt7))
        (gt_dir / "phase_to_frames_4.json").write_text(json.dumps(gt4))
        stem = "scan_relations_no_gt_test"
        (pred_dir / f"{stem}_phase_to_frames_7.json").write_text(json.dumps(pred7))
        (pred_dir / f"{stem}_phase_to_frames_4.json").write_text(json.dumps(pred4))

        assert cli.main([
            "phases-eval", "--gt-dir", str(gt_dir), "--pred-dir", str(pred_dir),
            "--pred-stem", stem,
        ]) == 0
        out = capsys.readouterr().out
        assert "Take 7" in out and "Take 4" in out
        assert "\ntrain\n" in out and "\nval\n" in out
        assert "Patient Roll-In" in out  # PHASE_LONG_NAMES rows

        from sklearn.metrics import f1_score

        from or4d_tpu.pipeline.phases import evaluate_phase_dirs, expand_to_per_frame as expand

        reports = evaluate_phase_dirs(gt_dir, pred_dir, pred_stem=stem)
        want = f1_score(expand(gt4, 12), expand(pred4, 12),
                        labels=list(range(8)), average="macro", zero_division=0)
        assert abs(reports["val"].macro_f1 - want) < 1e-9
        # missing prediction file -> take skipped, not crashed
        (gt_dir / "phase_to_frames_2.json").write_text(json.dumps(gt4))
        reports = evaluate_phase_dirs(gt_dir, pred_dir, pred_stem=stem)
        assert "take_2" not in reports and "test" not in reports
        # empty GT json ({} — no phases annotated) -> take skipped, not a
        # ValueError from max() over no ranges
        (gt_dir / "phase_to_frames_2.json").write_text("{}")
        (pred_dir / f"{stem}_phase_to_frames_2.json").write_text(json.dumps(pred4))
        reports = evaluate_phase_dirs(gt_dir, pred_dir, pred_stem=stem)
        assert "take_2" not in reports
        # multiple prediction stems without pred_stem -> loud warning (mixing
        # different models' outputs across takes must not pass silently)
        import pytest

        (pred_dir / "other_model_phase_to_frames_7.json").write_text(json.dumps(pred7))
        with pytest.warns(UserWarning, match="multiple prediction stems"):
            evaluate_phase_dirs(gt_dir, pred_dir)
