"""Evaluation metrics — the reference's sklearn classification_report
bookkeeping (scene_graph_prediction_model.py:195-238), reimplemented
hermetically (validated against sklearn in tests).

Per-take accumulation of relation predictions/GT, per-take reports, and the
metric of record: relation macro F1 over all takes.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict

import numpy as np


@dataclasses.dataclass
class ClassReport:
    labels: list[str]
    precision: np.ndarray
    recall: np.ndarray
    f1: np.ndarray
    support: np.ndarray

    @property
    def macro_precision(self) -> float:
        return float(self.precision.mean())

    @property
    def macro_recall(self) -> float:
        return float(self.recall.mean())

    @property
    def macro_f1(self) -> float:
        return float(self.f1.mean())

    @property
    def weighted_f1(self) -> float:
        tot = self.support.sum()
        return float((self.f1 * self.support).sum() / tot) if tot else 0.0

    @property
    def weighted_precision(self) -> float:
        tot = self.support.sum()
        return float((self.precision * self.support).sum() / tot) if tot else 0.0

    @property
    def weighted_recall(self) -> float:
        tot = self.support.sum()
        return float((self.recall * self.support).sum() / tot) if tot else 0.0

    def to_text(self) -> str:
        w = max(len(l) for l in self.labels) + 2
        lines = [f"{'':<{w}} {'prec':>6} {'rec':>6} {'f1':>6} {'support':>8}"]
        for i, l in enumerate(self.labels):
            lines.append(f"{l:<{w}} {self.precision[i]:6.2f} {self.recall[i]:6.2f} {self.f1[i]:6.2f} {int(self.support[i]):8d}")
        lines.append(f"{'macro avg':<{w}} {self.macro_precision:6.2f} {self.macro_recall:6.2f} {self.macro_f1:6.2f} {int(self.support.sum()):8d}")
        lines.append(f"{'weighted avg':<{w}} {self.weighted_precision:6.2f} {self.weighted_recall:6.2f} {self.weighted_f1:6.2f} {int(self.support.sum()):8d}")
        return "\n".join(lines)


def classification_report(y_true, y_pred, labels: list[str]) -> ClassReport:
    """sklearn-compatible per-class precision/recall/F1 over label ids
    0..len(labels)-1 (zero_division=0 semantics)."""
    y_true = np.asarray(y_true, np.int64)
    y_pred = np.asarray(y_pred, np.int64)
    n = len(labels)
    # out-of-range ids (e.g. -1 "no phase" frames) count toward the other
    # side's totals but never match — sklearn labels=range(n) semantics
    tp = np.bincount(y_true[(y_true == y_pred) & (y_true >= 0) & (y_true < n)], minlength=n)[:n].astype(np.float64)
    pred_count = np.bincount(y_pred[(y_pred >= 0) & (y_pred < n)], minlength=n)[:n].astype(np.float64)
    true_count = np.bincount(y_true[(y_true >= 0) & (y_true < n)], minlength=n)[:n].astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(pred_count > 0, tp / pred_count, 0.0)
        recall = np.where(true_count > 0, tp / true_count, 0.0)
        denom = precision + recall
        f1 = np.where(denom > 0, 2 * precision * recall / denom, 0.0)
    return ClassReport(list(labels), precision, recall, f1, true_count)


class RelationMetricAccumulator:
    """Per-take relation prediction bookkeeping (reference update_metrics /
    evaluate_predictions)."""

    def __init__(self, relation_names: list[str]):
        self.relation_names = list(relation_names)
        self.reset()

    def reset(self):
        self.take_preds: dict[int, list[int]] = defaultdict(list)
        self.take_gts: dict[int, list[int]] = defaultdict(list)

    def update(self, take_idx: int, preds: np.ndarray, gts: np.ndarray, mask: np.ndarray | None = None):
        preds = np.asarray(preds).reshape(-1)
        gts = np.asarray(gts).reshape(-1)
        if mask is not None:
            m = np.asarray(mask).reshape(-1).astype(bool)
            preds, gts = preds[m], gts[m]
        self.take_preds[take_idx].extend(preds.tolist())
        self.take_gts[take_idx].extend(gts.tolist())

    def update_batch(self, batch, rel_logprobs: np.ndarray):
        """Accumulate a whole SceneBatch given rel head output (S, E, R).
        Multi-hot gt_rels (MULTI_REL_OUTPUTS) is reduced to single labels for
        the report — SYMMETRICALLY on both sides: GT takes argmax where any
        relation bit is set and 'none' otherwise, and predictions (sigmoid
        probabilities in this mode) take argmax where any probability clears
        0.5 and 'none' otherwise. A plain argmax over the probabilities could
        never predict 'none' (its bit is never set in training targets), which
        would zero the class's recall and corrupt macro-F1."""
        out = np.asarray(rel_logprobs)
        gt = np.asarray(batch.gt_rels)
        if gt.ndim == 3:  # (S, E, R) multi-hot
            none_idx = (self.relation_names.index("none")
                        if "none" in self.relation_names else len(self.relation_names) - 1)
            preds = np.where(out.max(-1) > 0.5, out.argmax(-1), none_idx)
            gt = np.where(gt.max(-1) > 0.5, gt.argmax(-1), none_idx)
        else:
            preds = out.argmax(-1)
        for s, take_idx in enumerate(batch.take_idxs):
            self.update(take_idx, preds[s], gt[s], np.asarray(batch.edge_mask[s]))

    def per_take_reports(self) -> dict[int, ClassReport]:
        return {
            t: classification_report(self.take_gts[t], self.take_preds[t], self.relation_names)
            for t in sorted(self.take_preds)
        }

    def overall_report(self) -> ClassReport:
        gts = [g for t in sorted(self.take_gts) for g in self.take_gts[t]]
        preds = [p for t in sorted(self.take_preds) for p in self.take_preds[t]]
        return classification_report(gts, preds, self.relation_names)

    @property
    def macro_f1(self) -> float:
        return self.overall_report().macro_f1

    def confusion_matrix(self) -> np.ndarray:
        """(R, R) counts, rows = true label, cols = predicted (the sklearn
        layout the reference's utils/plot_confusion_matrix.py consumes)."""
        R = len(self.relation_names)
        cm = np.zeros((R, R), np.int64)
        for t in self.take_gts:
            for g, p in zip(self.take_gts[t], self.take_preds[t]):
                if 0 <= g < R and 0 <= p < R:
                    cm[g, p] += 1
        return cm


def plot_confusion_matrix(
    cm: np.ndarray,
    target_names: list[str],
    title: str = "Confusion matrix",
    normalize: bool = True,
    pth_out: str = "",
):
    """Render a confusion matrix to PNG (reference
    scene_graph_prediction/utils/plot_confusion_matrix.py semantics:
    row-normalized proportions, accuracy/misclass footer, per-cell text)."""
    import matplotlib

    matplotlib.use("Agg")
    import itertools

    import matplotlib.pyplot as plt

    cm = np.asarray(cm, np.float64)
    accuracy = np.trace(cm) / max(float(cm.sum()), 1.0)
    if normalize:
        cm = cm / np.maximum(cm.sum(axis=1, keepdims=True), 1e-12)
        cm = np.nan_to_num(cm, nan=0)
    fig = plt.figure(figsize=(8, 6))
    plt.imshow(cm, interpolation="nearest", cmap=plt.get_cmap("jet"))
    plt.title(title)
    plt.colorbar()
    ticks = np.arange(len(target_names))
    plt.xticks(ticks, target_names, rotation=90)
    plt.yticks(ticks, target_names)
    thresh = cm.max() / 1.5 if normalize else cm.max() / 2
    for i, j in itertools.product(range(cm.shape[0]), range(cm.shape[1])):
        txt = f"{cm[i, j]:0.4f}" if normalize else f"{int(cm[i, j]):,}"
        plt.text(j, i, txt, horizontalalignment="center",
                 color="white" if cm[i, j] > thresh else "black")
    fig.tight_layout()
    plt.ylabel("True label")
    plt.xlabel(f"Predicted label\naccuracy={accuracy:0.4f}; misclass={1 - accuracy:0.4f}")
    if pth_out:
        plt.savefig(pth_out)
    plt.close(fig)
    return fig
