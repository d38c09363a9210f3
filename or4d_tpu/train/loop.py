"""Training/eval driver — the TPU equivalent of the reference Lightning loop
(scene_graph_prediction/main.py:36-66 + SGPNModelWrapper train/val/predict
steps).

One jitted, state-donating train step runs AdamW (optax) on the mask-weighted
NLL; sharding in/out specs put scenes on the 'dp' mesh axis and object/edge
slots on 'mp', so the same step function is the single-chip and the
multi-chip program (XLA inserts the gradient psum over ICI).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from or4d_tpu.config import ExperimentConfig
from or4d_tpu.data.augment import augment_batch
from or4d_tpu.data.scene_batch import SceneBatch
from or4d_tpu.data.vocab import Vocab
from or4d_tpu.models.sgpn import SGPN, sgpn_loss
from or4d_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch
from or4d_tpu.train.metrics import RelationMetricAccumulator
from or4d_tpu.utils.profiling import StepTimer


def _gather_eval(x):
    """Assemble sharded eval outputs. On one host, fetching a dp-sharded
    array already gathers across local devices; across hosts the explicit
    collective is required (the reference's DataParallel does the
    equivalent device->rank0 gather implicitly)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(x)
    return x


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


@dataclasses.dataclass
class Trainer:
    """Owns model, optimizer, mesh, and the jitted step functions."""

    cfg: ExperimentConfig
    vocab: Vocab
    weights_obj: np.ndarray
    weights_rel: np.ndarray
    mesh: Any = None

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = make_mesh(dp=self.cfg.tpu.mesh_data, mp=self.cfg.tpu.mesh_model)
        self.model = SGPN.from_config(self.cfg, self.vocab.num_classes, self.vocab.num_relations)
        self.tx = optax.adamw(self.cfg.lr, weight_decay=self.cfg.w_decay)
        if self.cfg.image_input == "full":
            # frozen EfficientNet trunk: stop_gradient blocks the grads, but
            # AdamW weight decay would still shrink frozen params — mask them
            # out of the update entirely (reference freezing semantics)
            from or4d_tpu.models.efficientnet import sgpn_trainable_labels

            self.tx = optax.multi_transform(
                {"train": self.tx, "freeze": optax.set_to_zero()}, sgpn_trainable_labels
            )
        self._w_obj = jnp.asarray(self.weights_obj)
        self._w_rel = jnp.asarray(self.weights_rel)
        self._jit_cache: dict[str, Any] = {}

    # ------------------------------------------------------------------ init
    def init_state(self, rng: jax.Array, sample_batch: SceneBatch) -> TrainState:
        def _init(batch):
            variables = self.model.init({"params": rng, "dropout": rng}, batch, train=False)
            params = variables["params"]
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                batch_stats=variables.get("batch_stats", {}),
                opt_state=self.tx.init(params),
            )

        with self.mesh:
            init_fn = jax.jit(_init, out_shardings=replicated(self.mesh))
            return init_fn(shard_batch(sample_batch, self.mesh))

    # ------------------------------------------------------------------ steps
    def _train_step(self, state: TrainState, batch: SceneBatch, key: jax.Array, pack=None):
        aug_key, drop_key = jax.random.split(key)
        if self.cfg.dataset.data_augmentation:
            batch = augment_batch(aug_key, batch)

        def fwd(params):
            return self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                train=True,
                pack=pack,
                rngs={"dropout": drop_key},
                mutable=["batch_stats"],
            )

        if self.cfg.tpu.remat:
            # SELECTIVE remat: save the Pallas kernel outputs (tagged
            # "sa_kernel" at their call sites in models/pointnet2.py — FPS,
            # gated/ungated grouping) and recompute everything else (the
            # BN/MLP chain hiddens, 4.5G + 2x2.25G at S=16) in the VJP.
            # Whole-forward jax.checkpoint measured 2026-08-19 at S=8:
            # 994 vs 700 ms (−29%, it replays the selection kernels) AND
            # left the S=16 peak at the same 20.69G (single-segment remat
            # saves nothing when the segment is the whole forward) — the
            # policy form is the surviving variant. apply() is pure
            # (batch_stats mutation is functionalized), so this is exact.
            fwd = jax.checkpoint(
                fwd, policy=jax.checkpoint_policies.save_only_these_names("sa_kernel")
            )

        def loss_fn(params):
            outputs, mutated = fwd(params)
            loss, parts = sgpn_loss(outputs, batch, self._w_obj, self._w_rel, self.cfg.model.lambda_o)
            return loss, (parts, mutated.get("batch_stats", {}), outputs.rel_logprobs)

        (loss, (parts, new_stats, rel_logprobs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params, batch_stats=new_stats, opt_state=new_opt)
        return new_state, parts, rel_logprobs

    def _eval_step(self, state: TrainState, batch: SceneBatch, pack=None):
        outputs = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, batch, train=False, pack=pack
        )
        return outputs.rel_logprobs, outputs.obj_logprobs

    def _jitted(self, name: str):
        if name in self._jit_cache:
            return self._jit_cache[name]
        # input shardings are inferred from the device_put-committed batch
        # (shard_batch) and the replicated state from init_state
        if name == "train":
            fn = jax.jit(
                self._train_step,
                donate_argnums=(0,) if self.cfg.tpu.donate_state else (),
            )
        elif name == "eval":
            fn = jax.jit(self._eval_step)
        else:
            raise KeyError(name)
        self._jit_cache[name] = fn
        return fn

    def _pack_for(self, batch: SceneBatch, paired: bool = False):
        """Slot packing skips padded object/edge rows through the encoders.
        Single device: one flat plan. dp>1 (mp=1): per-shard plans whose
        gathers stay inside each dp shard (SlotPack.build(shards=dp)),
        sharded over 'dp'. mp>1 shards the slot axes themselves, which a
        compaction over slots would re-mix — packing is skipped there.
        ``paired``: add the eval pair plan (encode each unordered relation
        pair once — requires pair-shared crops, data/prep.py)."""
        from or4d_tpu.data.scene_batch import SlotPack

        if self.mesh.devices.size == 1:
            return SlotPack.build(batch, paired=paired)
        dp = self.mesh.shape["dp"]
        if self.mesh.shape["mp"] != 1 or batch.num_scenes % dp:
            if self.mesh.shape["mp"] != 1 and not getattr(self, "_warned_mp_pack", False):
                print(
                    "WARNING: slot packing is disabled on mp>1 meshes — padded "
                    "object/edge slots run through the encoders (~45% extra work "
                    "at paper shapes). Prefer dp-only meshes for this model; its "
                    "slot axes are small enough that mp adds communication, not "
                    "memory headroom (train/loop.py:_pack_for)."
                )
                self._warned_mp_pack = True
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        pack = SlotPack.build(batch, shards=dp, paired=paired)
        sh = NamedSharding(self.mesh, P("dp"))
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), pack)

    def train_step(self, state: TrainState, batch: SceneBatch, key: jax.Array):
        if batch.num_scenes % self.mesh.shape["dp"]:
            batch = batch.pad_scenes(self.mesh.shape["dp"])
        pack = self._pack_for(batch)
        with self.mesh:
            return self._jitted("train")(state, shard_batch(batch, self.mesh), key, pack)

    def eval_step(self, state: TrainState, batch: SceneBatch):
        from or4d_tpu.data.scene_batch import is_pair_shared

        if batch.num_scenes % self.mesh.shape["dp"]:
            batch = batch.pad_scenes(self.mesh.shape["dp"])
        # pair-shared batches (ORDataset for_eval / bench) encode each
        # unordered relation pair once through the paired rel encoder
        pack = self._pack_for(batch, paired=is_pair_shared(batch))
        with self.mesh:
            rel, obj = self._jitted("eval")(state, shard_batch(batch, self.mesh), pack)
        return _gather_eval(rel), _gather_eval(obj)

    # ------------------------------------------------------------------ loops
    def fit(
        self,
        state: TrainState,
        train_batches,
        val_batches=None,
        epochs: int | None = None,
        rng: jax.Array | None = None,
        log_every: int = 100,
        checkpoint_dir: str | None = None,
        log_dir: str | None = None,
        serving_val: bool = False,
    ):
        """Epoch loop with per-take metric accumulation (reference
        training_epoch_end/validation_epoch_end).

        ``serving_val``: run the per-epoch validation through a
        ServingEvaluator built ONCE before the loop — the val split's
        FPS/ball-query geometry is weights-independent, so the reference's
        validate-every-epoch pattern (main.py:62-66) pays it a single time
        instead of every epoch (or4d_tpu/serving.py)."""
        from or4d_tpu.train import checkpoint as ckpt

        logger = None
        if log_dir:
            from or4d_tpu.utils.logging import MetricsLogger

            logger = MetricsLogger(log_dir, name=self.cfg.name)
        server = None
        if serving_val and val_batches is not None:
            from or4d_tpu.serving import ServingEvaluator

            val_batches = list(val_batches)
            server = ServingEvaluator(self, val_batches)
        epochs = epochs or self.cfg.max_epochs
        rng = rng if rng is not None else jax.random.key(self.cfg.seed)
        history = []
        timer = StepTimer()
        for epoch in range(epochs):
            acc = RelationMetricAccumulator(list(self.vocab.relation_names))
            losses = []
            for i, batch in enumerate(train_batches):
                rng, key = jax.random.split(rng)
                with timer.step():
                    state, parts, rel_logprobs = self.train_step(state, batch, key)
                losses.append(parts["loss"])
                acc.update_batch(batch, np.asarray(rel_logprobs))
                if log_every and i % log_every == 0:
                    print(f"epoch {epoch} step {i}: loss={float(parts['loss']):.4f} ({timer.summary()})")
            train_f1 = acc.macro_f1
            record = {"epoch": epoch, "train_loss": float(np.mean([float(l) for l in losses])), "train_macro_f1": train_f1}
            if val_batches is not None:
                record["val_macro_f1"] = (
                    server.evaluate(state) if server is not None
                    else self.evaluate(state, val_batches)
                )
            history.append(record)
            print(f"epoch {epoch}: {record}")
            if logger:
                logger.log(epoch, **record, steps_per_sec=1e3 / timer.mean_ms if timer.mean_ms else 0.0)
                logger.log_per_take(epoch, "train", acc.per_take_reports())
                logger.log_report("train_report", epoch, acc.overall_report().to_text())
            if checkpoint_dir:
                ckpt.save(checkpoint_dir, state, step=epoch)
        if logger:
            logger.close()
        return state, history

    def evaluate(self, state: TrainState, batches, verbose: bool = False) -> float:
        acc = RelationMetricAccumulator(list(self.vocab.relation_names))
        # one-batch lookahead (utils/stream.py): batch i+1's upload + forward
        # are dispatched BEFORE batch i's logits are pulled, overlapping
        # device compute with the (slow) host transfer
        from or4d_tpu.utils.stream import lookahead

        lookahead(
            batches,
            lambda batch: (batch, self.eval_step(state, batch)[0]),
            lambda pair: acc.update_batch(pair[0], np.asarray(pair[1])),
        )
        if verbose:
            for take, report in acc.per_take_reports().items():
                print(f"\nTake {take}\n{report.to_text()}")
            print(f"\nOverall:\n{acc.overall_report().to_text()}")
        return acc.macro_f1

    # ------------------------------------------------------------------ infer
    def predict_relations(self, state: TrainState, batches) -> dict[str, list]:
        """The reference predict_step -> scan_relations mapping
        (scene_graph_prediction_model.py:157-177 + main.py:111-115):
        argmax over relation logits, drop 'none', map slots to object names.

        MULTI_REL_OUTPUTS: the head emits independent sigmoid probabilities,
        so each relation is thresholded at 0.5 per edge (the 3DSSG-lineage
        multi-label decision PointNetRelClsMulti was built for) — an edge can
        carry several relations or none; argmax would force exactly one."""
        none_idx = self.vocab.none_index
        multi = bool(getattr(self.model, "multi_rel_outputs", False))
        scan_relations: dict[str, list] = {}
        for batch in batches:
            rel_logprobs, _ = self.eval_step(state, batch)
            out = np.asarray(rel_logprobs)
            preds = None if multi else out.argmax(-1)
            for s, scan_id in enumerate(batch.scan_ids):
                relations = []
                names = batch.slot_names[s]
                em = np.asarray(batch.edge_mask[s])
                ei = np.asarray(batch.edge_index[s])
                for e in range(len(em)):
                    if not em[e]:
                        continue
                    sub = names[ei[e, 0]]
                    obj = names[ei[e, 1]]
                    rels = np.nonzero(out[s, e] > 0.5)[0] if multi else [preds[s, e]]
                    for r in rels:
                        if r == none_idx:
                            continue
                        relations.append((sub, self.vocab.relation_names[r], obj))
                scan_relations[scan_id] = relations
        return scan_relations
