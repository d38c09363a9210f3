"""Confusion-matrix computation + PNG rendering (reference
scene_graph_prediction/utils/plot_confusion_matrix.py parity)."""

import numpy as np


class TestConfusionMatrix:
    def test_counts_and_plot(self, tmp_path):
        from or4d_tpu.train.metrics import RelationMetricAccumulator, plot_confusion_matrix

        acc = RelationMetricAccumulator(["a", "b", "c"])
        acc.update(1, np.array([0, 1, 2, 1]), np.array([0, 1, 1, 1]))
        cm = acc.confusion_matrix()
        assert cm[1, 1] == 2 and cm[1, 2] == 1 and cm[0, 0] == 1
        assert cm.sum() == 4
        out = tmp_path / "cm.png"
        plot_confusion_matrix(cm, ["a", "b", "c"], pth_out=str(out))
        assert out.exists() and out.stat().st_size > 1000

    def test_row_normalization_semantics(self, tmp_path):
        """normalize=True divides by the TRUE-label row sums (reference
        cm.astype(float)/cm.sum(axis=1)[:, None])."""
        from or4d_tpu.train.metrics import plot_confusion_matrix

        cm = np.array([[8, 2], [0, 0]])
        # must not crash on an empty row (nan_to_num in the reference)
        out = tmp_path / "cm.png"
        plot_confusion_matrix(cm, ["x", "y"], pth_out=str(out))
        assert out.exists()
