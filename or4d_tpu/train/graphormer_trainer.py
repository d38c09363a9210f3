"""Graphormer role-prediction trainer.

Reference: `role_prediction/graphormer/entry.py` + `model.py` training logic:
  * AdamW, peak_lr 2e-4, weight_decay (model.py:403-407);
  * PolynomialDecayLR: linear warmup 40000 updates then power-1 decay to
    end_lr over 400000 (lr.py:7-34);
  * CE loss over 5 roles, one label per track;
  * WeightedRandomSampler balancing roles (data.py:83-116);
  * eval: temperature-4 softmax scores per track
    (role_prediction_helpers.py:161), greedy unique role assignment per frame
    via the shared assignment logic in pipeline/roles_heuristic.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from or4d_tpu.models.graphormer import ROLE_NAMES, Graphormer, GraphormerBatch


def polynomial_decay_lr(peak_lr: float, end_lr: float, warmup: int, total: int, power: float = 1.0):
    """The reference PolynomialDecayLR as an optax schedule (1-indexed steps)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32) + 1.0  # torch _step_count starts at 1
        warm = step / max(warmup, 1) * peak_lr
        pct = 1.0 - (step - warmup) / max(total - warmup, 1)
        decay = (peak_lr - end_lr) * jnp.clip(pct, 0.0, 1.0) ** power + end_lr
        return jnp.where(step <= warmup, warm, jnp.where(step >= total, end_lr, decay))

    return schedule


@dataclasses.dataclass
class GraphormerTrainer:
    n_layers: int = 12
    hidden: int = 80
    ffn: int = 80
    heads: int = 8
    dropout: float = 0.1
    peak_lr: float = 2e-4
    end_lr: float = 1e-9
    weight_decay: float = 0.01
    warmup_updates: int = 40_000
    tot_updates: int = 400_000
    num_classes: int = 5

    def __post_init__(self):
        self.model = Graphormer(
            num_classes=self.num_classes,
            n_layers=self.n_layers,
            hidden=self.hidden,
            ffn=self.ffn,
            heads=self.heads,
            dropout=self.dropout,
            attn_dropout=self.dropout,
            input_dropout=self.dropout,
        )
        self.tx = optax.adamw(
            polynomial_decay_lr(self.peak_lr, self.end_lr, self.warmup_updates, self.tot_updates),
            weight_decay=self.weight_decay,
        )
        self._train_step = jax.jit(self._train_step_impl)
        self._score = jax.jit(self._score_impl)

    def init_state(self, rng: jax.Array, sample: GraphormerBatch):
        params = self.model.init({"params": rng, "dropout": rng}, sample, train=False)["params"]
        return {"params": params, "opt_state": self.tx.init(params), "step": jnp.zeros((), jnp.int32)}

    def _train_step_impl(self, state, batch: GraphormerBatch, label: jax.Array, key: jax.Array):
        def loss_fn(params):
            logits = self.model.apply({"params": params}, batch, train=True, rngs={"dropout": key})
            return -jax.nn.log_softmax(logits)[label]

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt_state = self.tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state, "step": state["step"] + 1}, loss

    def train_step(self, state, batch: GraphormerBatch, label: int, key: jax.Array):
        return self._train_step(state, batch, jnp.asarray(label), key)

    # ------------------------------------------------------------- FLAG
    def flag_train_step(self, state, batch: GraphormerBatch, label: int, key: jax.Array, m: int = 3, step_size: float = 1e-3, mag: float = 1e-3):
        """FLAG adversarial-perturbation training
        (role_prediction/graphormer/utils/flag.py:9-51): ascend the loss in
        the node-embedding perturbation with sign steps projected to an
        L2 ball of radius ``mag``, averaging the loss over m inner steps."""
        if not hasattr(self, "_flag_step"):

            def one(params, perturb, batch, label, key):
                def loss_fn(pert):
                    logits = self.model.apply(
                        {"params": params}, batch, train=True, rngs={"dropout": key}, perturb=pert
                    )
                    return -jax.nn.log_softmax(logits)[label]

                return jax.value_and_grad(loss_fn)(perturb)

            self._flag_inner = jax.jit(one)

            def grad_at(params, perturb, batch, label, key):
                def loss_fn(p):
                    logits = self.model.apply(
                        {"params": p}, batch, train=True, rngs={"dropout": key}, perturb=perturb
                    )
                    return -jax.nn.log_softmax(logits)[label]

                return jax.value_and_grad(loss_fn)(params)

            self._flag_param_grad = jax.jit(grad_at)

        G, N = batch.x.shape
        shape = (G, N, self.hidden)
        key, pk = jax.random.split(key)
        perturb = jax.random.uniform(pk, shape, minval=-1.0, maxval=1.0) * (mag / np.sqrt(self.hidden))
        grad_acc = jax.tree_util.tree_map(jnp.zeros_like, state["params"])
        total_loss = 0.0
        label_arr = jnp.asarray(label)
        for _ in range(m):
            key, dk = jax.random.split(key)
            loss, pgrad = self._flag_inner(state["params"], perturb, batch, label_arr, dk)
            g = self._flag_param_grad(state["params"], perturb, batch, label_arr, dk)[1]
            grad_acc = jax.tree_util.tree_map(lambda a, b: a + b / m, grad_acc, g)
            total_loss += float(loss) / m
            perturb = perturb + step_size * jnp.sign(pgrad)
            norm = jnp.linalg.norm(perturb, axis=-1, keepdims=True)
            perturb = jnp.where(norm > mag, perturb * (mag / jnp.maximum(norm, 1e-12)), perturb)
        updates, opt_state = self.tx.update(grad_acc, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state, "step": state["step"] + 1}, total_loss

    def _score_impl(self, params, batch: GraphormerBatch):
        logits = self.model.apply({"params": params}, batch, train=False)
        return jax.nn.softmax(logits / 4.0)  # temperature-4 scoring

    def score_track(self, state, batch: GraphormerBatch) -> dict[str, float]:
        scores = np.asarray(self._score(state["params"], batch))
        return {name: float(scores[i]) for i, name in enumerate(ROLE_NAMES)}

    def fit(self, state, tracks: list[tuple[GraphormerBatch, int]], epochs: int = 1, rng: jax.Array | None = None, balance: bool = True, checkpoint_dir=None):
        """``tracks``: (batch, role_label) pairs; weighted sampling balances
        role frequencies (reference WeightedRandomSampler). With
        ``checkpoint_dir`` the state is saved after every epoch — the
        equivalent of the reference's ModelCheckpoint(save_last=True) +
        last.ckpt auto-resume (entry.py:95-107)."""
        from or4d_tpu.train import checkpoint as ckpt

        rng = rng if rng is not None else jax.random.key(0)
        labels = np.array([t[1] for t in tracks])
        if balance and len(tracks) > 1:
            counts = np.bincount(labels, minlength=self.num_classes).astype(np.float64)
            w = 1.0 / np.maximum(counts[labels], 1.0)
            p = w / w.sum()
        else:
            p = None
        nrng = np.random.default_rng(0)
        losses = []
        for epoch in range(epochs):
            order = nrng.choice(len(tracks), size=len(tracks), replace=balance, p=p)
            for i in order:
                rng, key = jax.random.split(rng)
                batch, label = tracks[int(i)]
                state, loss = self.train_step(state, batch, label, key)
                losses.append(float(loss))
            if checkpoint_dir is not None:
                ckpt.save(checkpoint_dir, state, step=epoch)
        return state, losses


