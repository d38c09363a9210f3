"""Training drivers for the L1 perception models.

Reference training envelopes (SURVEY.md §2.4/§6):
  * HigherHRNet: heatmap MSE + AE pull/push, Adam (tools/dist_train.py);
  * VoxelPose: patient-weighted L1 pose loss, Adam 1e-4
    (run/train_3d.py, multi_person_posenet.py:36-103);
  * Group-Free: AdamW, stepwise LR decay, 180 epochs batch 16
    (train_dist.py:56-117).

Each trainer owns one jitted state-donating step; the data pipelines feed
fixed-shape batches (padded people/boxes with masks).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _make_state(model, tx, variables):
    return {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": tx.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }


def _apply_update(tx, state, grads, new_stats, loss, extras=None):
    updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
    params = optax.apply_updates(state["params"], updates)
    new_state = {
        "params": params,
        "batch_stats": new_stats,
        "opt_state": opt_state,
        "step": state["step"] + 1,
    }
    return new_state, loss, extras


@dataclasses.dataclass
class HigherHRNetTrainer:
    """2D pose: dual-resolution heatmap MSE + AE loss on the tag maps."""

    num_joints: int = 14
    lr: float = 1e-3
    ae_weight: float = 1e-3

    def __post_init__(self):
        from or4d_tpu.models.higherhrnet import HigherHRNet

        self.model = HigherHRNet(num_joints=self.num_joints)
        self.tx = optax.adam(self.lr)
        self._step = jax.jit(self._step_impl, donate_argnums=(0,))

    def init_state(self, rng, images):
        return _make_state(self.model, self.tx, self.model.init(rng, images, train=False))

    def _step_impl(self, state, images, gt_low, gt_high, joint_pos, joint_valid):
        from or4d_tpu.models.higherhrnet import ae_loss, heatmap_loss

        def loss_fn(params):
            (low, high), mutated = self.model.apply(
                {"params": params, "batch_stats": state["batch_stats"]},
                images, train=True, mutable=["batch_stats"],
            )
            J = self.num_joints
            l_hm = heatmap_loss(low[..., :J], gt_low) + heatmap_loss(high, gt_high)
            l_ae = 0.0
            for b in range(images.shape[0]):
                # tag positions live at 1/4 resolution
                ae, _ = ae_loss(low[b, ..., J:], joint_pos[b], joint_valid[b])
                l_ae = l_ae + ae
            loss = l_hm + self.ae_weight * l_ae / images.shape[0]
            return loss, mutated.get("batch_stats", {})

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["params"])
        return _apply_update(self.tx, state, grads, stats, loss)

    def train_step(self, state, images, gt_low, gt_high, joint_pos, joint_valid):
        return self._step(state, images, gt_low, gt_high, joint_pos, joint_valid)


@dataclasses.dataclass
class VoxelPoseTrainer:
    """3D pose: patient-weighted L1 on matched poses (LOSS.PATIENT_WEIGHT 4)."""

    lr: float = 1e-4
    patient_weight: float = 4.0
    # VoxelPose field overrides (grid sizes, max_people) — reference defaults
    model_kwargs: dict = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        from or4d_tpu.models.voxelpose import VoxelPose

        self.model = VoxelPose(**self.model_kwargs)
        self.tx = optax.adam(self.lr)
        self._step = jax.jit(self._step_impl, donate_argnums=(0,))

    accumulation_steps: int = 4

    def init_state(self, rng, heatmaps, cameras, heatmap_scale):
        v = self.model.init(rng, heatmaps, cameras, heatmap_scale, train=False)
        state = _make_state(self.model, self.tx, v)
        # loss_3d gradient accumulator (reference function.py:32-33,62-69):
        # root-cube MSE grads are summed over accumulation_steps iterations
        # and applied in a separate optimizer step
        state["accum3d"] = jax.tree_util.tree_map(jnp.zeros_like, state["params"])
        state["accum3d_loss"] = jnp.zeros((), jnp.float32)
        return state

    def _step_impl(self, state, heatmaps, cameras, heatmap_scale, gt_roots, gt_poses, gt_vis, gt_mask, patient_slots, target_3d):
        """One reference training iteration (core/function.py:36-69 for the
        OR_4D input-heatmap path, where loss_2d == 0):

          1. if loss_cord > 0: optimizer step on the pose (cord) loss;
          2. every accumulation_steps-th iteration with a positive
             accumulated loss_3d: a SECOND optimizer step on the accumulated
             root-cube grads — and, exactly like the reference's
             if/else (:63-69), the firing iteration's own loss_3d is
             DROPPED, not accumulated.
        """
        from or4d_tpu.models.voxelpose import voxelpose_loss, voxelpose_loss_3d

        def fwd(params):
            (poses, _scores, centers, root), mutated = self.model.apply(
                {"params": params, "batch_stats": state["batch_stats"]},
                heatmaps, cameras, heatmap_scale, train=True, mutable=["batch_stats"],
            )
            loss_cord = voxelpose_loss(
                poses, centers, gt_roots, gt_poses, gt_vis, gt_mask,
                patient_slot_mask=patient_slots, patient_weight=self.patient_weight,
            )
            loss_3d = voxelpose_loss_3d(root, target_3d)
            return (loss_cord, loss_3d), mutated.get("batch_stats", {})

        (loss_cord, loss_3d), vjp_fn, stats = jax.vjp(fwd, state["params"], has_aux=True)
        one = jnp.ones((), loss_cord.dtype)
        zero = jnp.zeros((), loss_cord.dtype)
        (g_cord,) = vjp_fn((one, zero))
        (g_3d,) = vjp_fn((zero, one))

        def cord_update(args):
            params, opt_state = args
            updates, opt_state = self.tx.update(g_cord, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        params, opt_state = jax.lax.cond(
            loss_cord > 0, cord_update, lambda a: a, (state["params"], state["opt_state"])
        )

        nacc = float(self.accumulation_steps)
        fire = jnp.logical_and(state["accum3d_loss"] > 0, (state["step"] + 1) % self.accumulation_steps == 0)

        def fire_update(args):
            params, opt_state, accum, _aloss = args
            updates, opt_state = self.tx.update(accum, opt_state, params)
            params = optax.apply_updates(params, updates)
            zeros = jax.tree_util.tree_map(jnp.zeros_like, accum)
            return params, opt_state, zeros, jnp.zeros((), jnp.float32)

        def accumulate(args):
            params, opt_state, accum, aloss = args
            accum = jax.tree_util.tree_map(lambda a, g: a + g / nacc, accum, g_3d)
            return params, opt_state, accum, aloss + loss_3d / nacc

        params, opt_state, accum, aloss = jax.lax.cond(
            fire, fire_update, accumulate,
            (params, opt_state, state["accum3d"], state["accum3d_loss"]),
        )
        new_state = {
            "params": params,
            "batch_stats": stats,
            "opt_state": opt_state,
            "step": state["step"] + 1,
            "accum3d": accum,
            "accum3d_loss": aloss,
        }
        return new_state, loss_cord + loss_3d, {"loss_cord": loss_cord, "loss_3d": loss_3d}

    def train_step(self, state, heatmaps, cameras, heatmap_scale, gt_roots, gt_poses, gt_vis, gt_mask, patient_slots, target_3d):
        return self._step(state, heatmaps, cameras, heatmap_scale, gt_roots, gt_poses, gt_vis, gt_mask, patient_slots, target_3d)

    def train_step_from_sample(self, state, sample: dict, cameras, heatmap_scale):
        """One VoxelPoseDataset frame dict -> a train step."""
        return self.train_step(
            state,
            sample["input_heatmaps"], cameras, heatmap_scale,
            sample["gt_roots"], sample["gt_poses"], sample["gt_vis"],
            sample["gt_mask"], sample["patient_mask"], sample["target_3d"],
        )


@dataclasses.dataclass
class GroupFreeTrainer:
    """3D detection: KPS + per-head box/sem losses, AdamW + step decay."""

    num_proposal: int = 128
    num_decoder_layers: int = 6
    lr: float = 6e-3
    weight_decay: float = 5e-4
    decay_steps: tuple = (56000, 78000, 90000)
    decay_rate: float = 0.1

    def __post_init__(self):
        from or4d_tpu.models.groupfree import GroupFreeDetector

        self.model = GroupFreeDetector(num_proposal=self.num_proposal, num_decoder_layers=self.num_decoder_layers)
        boundaries = {s: self.decay_rate for s in self.decay_steps}
        schedule = optax.piecewise_constant_schedule(self.lr, boundaries)
        self.tx = optax.adamw(schedule, weight_decay=self.weight_decay)
        self._step = jax.jit(self._step_impl, donate_argnums=(0,))

    def init_state(self, rng, pc, mean_size_arr):
        v = self.model.init(rng, pc, mean_size_arr, train=False)
        return _make_state(self.model, self.tx, v)

    def _step_impl(self, state, pc, mean_size_arr, point_instance_label, gt, key):
        from or4d_tpu.models.groupfree_loss import groupfree_total_loss

        def loss_fn(params):
            out, mutated = self.model.apply(
                {"params": params, "batch_stats": state["batch_stats"]},
                pc, mean_size_arr, train=True, mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            # per-seed instance assignment via the backbone's own seed
            # indices (reference loss_helper.py:11-21 gather)
            seed_instance = jnp.take_along_axis(point_instance_label, out["seed_inds"], axis=1)
            total, parts = groupfree_total_loss(out, seed_instance, gt, mean_size_arr, out["seed_xyz"])
            return total, (mutated.get("batch_stats", {}), parts)

        (loss, (stats, parts)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["params"])
        return _apply_update(self.tx, state, grads, stats, loss, parts)

    def train_step(self, state, pc, mean_size_arr, point_instance_label, gt, key=None):
        key = key if key is not None else jax.random.key(0)
        return self._step(state, pc, mean_size_arr, point_instance_label, gt, key)

    def train_step_from_batch(self, state, batch: dict, mean_size_arr, key=None):
        """One step from a GroupFreeDetectionDataset.batch() dict."""
        return self.train_step(
            state,
            jnp.asarray(batch["point_clouds"]),
            jnp.asarray(mean_size_arr),
            jnp.asarray(batch["point_instance_label"]),
            {k: jnp.asarray(v) for k, v in batch["gt"].items()},
            key,
        )
