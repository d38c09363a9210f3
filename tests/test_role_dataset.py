"""Role dataset + Graphormer trainer integration: track labeling, synthetic
dataset, and a short training run whose loss decreases."""

import numpy as np
import jax
import pytest

from or4d_tpu.pipeline.role_dataset import (
    RoleTrack,
    build_tracks,
    label_track,
    load_gt_scene_graphs_in_prediction_format,
    majority_role,
    make_synthetic_role_dataset,
    make_synthetic_track,
)
from or4d_tpu.pipeline.role_graphormer import ROLE_TO_INDEX
from or4d_tpu.train.graphormer_trainer import GraphormerTrainer, polynomial_decay_lr


class TestLabeling:
    def test_majority_role(self):
        assert majority_role(["Patient", "Patient", "head-surgeon", None]) == "Patient"
        assert majority_role([None, None]) is None

    def test_label_track_nearest_gt(self):
        joints_a = np.zeros((14, 3))
        joints_b = np.ones((14, 3)) * 10
        poses = {"000001": ("human_0", joints_a + 0.1)}
        gt = {"000001": {"1": ("head-surgeon", joints_a), "2": ("Patient", joints_b)}}
        assert label_track(poses, gt) == "head-surgeon"

    def test_build_tracks_filters(self):
        t_ok = {"timestamp_to_human_pose": {"000001": ("human_0", np.zeros((14, 3)))}}
        t_empty = {"timestamp_to_human_pose": {"000009": ("human_1", np.zeros((14, 3)))}}
        rels = {"000001": [("human_0", "LyingOn", "operating_table")]}
        gt = {"000001": {"1": ("Patient", np.zeros((14, 3)))}}
        tracks = build_tracks(4, [t_ok, t_empty], rels, gt)
        assert len(tracks) == 1
        assert tracks[0].role_label == ROLE_TO_INDEX["Patient"]

    def test_gt_prediction_format_patient_rename(self, tmp_path):
        import json

        scans = {
            "scans": [
                {
                    "take_idx": 4,
                    "scan": "000000",
                    "objects": {"1": "Patient", "2": "human_0", "3": "operating_table"},
                    "relationships": [[1, 3, 8, "LyingOn"]],
                    "human_idx_to_name": {},
                }
            ]
        }
        (tmp_path / "relationships_validation.json").write_text(json.dumps(scans))
        out = load_gt_scene_graphs_in_prediction_format(tmp_path)
        assert out["4_000000"] == [("human_1", "LyingOn", "operating_table")]


class TestSyntheticAndTraining:
    def test_synthetic_dataset_shapes(self):
        data = make_synthetic_role_dataset(tracks_per_role=1, n_frames=3, max_graphs=3)
        assert len(data) == 5
        batch, label = data[0]
        assert batch.x.shape[0] == 3
        assert 0 <= label < 5

    def test_trainer_loss_decreases(self):
        trainer = GraphormerTrainer(n_layers=2, hidden=16, ffn=16, heads=4, peak_lr=1e-3, warmup_updates=5, tot_updates=200)
        data = make_synthetic_role_dataset(tracks_per_role=1, n_frames=2, max_graphs=2)
        state = trainer.init_state(jax.random.key(0), data[0][0])
        state, losses = trainer.fit(state, data, epochs=6, balance=False)
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_score_track_temperature(self):
        trainer = GraphormerTrainer(n_layers=1, hidden=16, ffn=16, heads=4)
        batch, _ = make_synthetic_role_dataset(tracks_per_role=1, n_frames=2, max_graphs=2)[0]
        state = trainer.init_state(jax.random.key(1), batch)
        scores = trainer.score_track(state, batch)
        assert set(scores) == {"Patient", "head_surgeon", "assistant_surgeon", "circulating_nurse", "anaesthetist"}
        assert abs(sum(scores.values()) - 1.0) < 1e-5

    def test_polynomial_decay_schedule(self):
        import jax.numpy as jnp

        sched = polynomial_decay_lr(peak_lr=1.0, end_lr=0.1, warmup=10, total=100)
        # torch 1-indexed: step_count = step+1
        assert float(sched(0)) == pytest.approx(0.1)  # first update: 1/10 * 1.0
        assert float(sched(9)) == pytest.approx(1.0)  # end of warmup
        assert float(sched(54)) == pytest.approx(1.0 - (55 - 10) / 90 * 0.9, rel=1e-5)
        assert float(sched(200)) == pytest.approx(0.1)
