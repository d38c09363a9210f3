"""Data augmentation as jittable pure functions of a PRNG key.

Reference: `scene_graph_helpers/dataset/augmentation_utils.py`:
  * per-object-crop: scalar brightness jitter +-0.1 on rgb, per-channel hue
    jitter, clamp [0,1], xyz shift +-0.15, rotate about the crop centroid —
    y-euler +-45, then the reference's faithful quirk of applying the "x"
    rotation about the y axis too (+-20), then z +-20 — scale U(0.4, 1.6) (:7-41);
  * per-relation-crop: for contact relations, zero out points farther than a
    random threshold from the hands (:44-62); then the object augmentation on
    the whole crop; then a milder second pass applied separately to the
    subject (mask==1) and object (mask==2) point subsets;
  * applied with p=0.75 per sample (or_dataset.py:122-127).

TPU design: everything is vmapped over the (scene, slot) axes with masked
subset transforms (the reference's ragged boolean-subset augmentation becomes
a `where` over the mask channel), so augmentation runs on-device inside the
input pipeline's jit.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from or4d_tpu.data.vocab import CONTACT_RELATIONS, DEFAULT_VOCAB

OBJ_CFG = {"brightness": 0.1, "colors": 0.05, "x_rot": 20.0, "y_rot": 45.0, "z_rot": 20.0, "shift": 0.15, "scale": (0.4, 1.6)}
REL_CFG = {"brightness": 0.1, "colors": 0.025, "x_rot": 10.0, "y_rot": 20.0, "z_rot": 10.0, "shift": 0.1, "scale": (0.4, 1.6)}
HAND_THRESHOLD = 0.2

# contact-relation ids under the default vocab
_CONTACT_IDS = tuple(DEFAULT_VOCAB.relation_index(r) for r in CONTACT_RELATIONS)


def _rot_y(deg):
    r = jnp.deg2rad(deg)
    c, s = jnp.cos(r), jnp.sin(r)
    return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]]).reshape(3, 3)


def _rot_z(deg):
    r = jnp.deg2rad(deg)
    c, s = jnp.cos(r), jnp.sin(r)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]]).reshape(3, 3)


def _augment_crop(key, points, cfg, subset_mask=None):
    """One crop (P, C>=6): xyz in [:, :3], rgb in [:, 3:6]; extra channels
    pass through. ``subset_mask`` (P,) restricts the transform to a subset
    (the reference's per-mask-channel second pass)."""
    kb, kc, ks, ky, kx, kz, kg = jax.random.split(key, 7)
    xyz = points[:, :3]
    rgb = points[:, 3:6]
    m = jnp.ones(points.shape[0], bool) if subset_mask is None else subset_mask
    mf = m[:, None].astype(points.dtype)

    rgb_new = rgb + jax.random.uniform(kb, (), minval=-cfg["brightness"], maxval=cfg["brightness"])
    rgb_new = rgb_new + jax.random.uniform(kc, (3,), minval=-cfg["colors"], maxval=cfg["colors"])
    rgb_new = jnp.clip(rgb_new, 0.0, 1.0)

    xyz_new = xyz + jax.random.uniform(ks, (3,), minval=-cfg["shift"], maxval=cfg["shift"])
    count = jnp.maximum(jnp.sum(mf), 1.0)
    center = jnp.sum(xyz_new * mf, axis=0) / count
    centered = xyz_new - center
    y_rot = jax.random.uniform(ky, (), minval=-cfg["y_rot"], maxval=cfg["y_rot"])
    x_rot = jax.random.uniform(kx, (), minval=-cfg["x_rot"], maxval=cfg["x_rot"])
    z_rot = jax.random.uniform(kz, (), minval=-cfg["z_rot"], maxval=cfg["z_rot"])
    # reference quirk: the "x" rotation is also applied about the y axis
    R = _rot_y(y_rot) @ _rot_y(x_rot) @ _rot_z(z_rot)
    # reference right-multiplies: p' = p @ R_y(y) then @ R_y(x) then @ R_z(z)
    rotated = centered @ _rot_y(y_rot) @ _rot_y(x_rot) @ _rot_z(z_rot)
    del R
    scale = jax.random.uniform(kg, (), minval=cfg["scale"][0], maxval=cfg["scale"][1])
    xyz_new = rotated * scale + center

    out_xyz = jnp.where(m[:, None], xyz_new, xyz)
    out_rgb = jnp.where(m[:, None], rgb_new, rgb)
    return jnp.concatenate([out_xyz, out_rgb, points[:, 6:]], axis=1)


def _augment_rel_crop(key, points, hand_points, is_contact):
    """One relation crop (P, 7) with the hand-proximity zeroing + two-pass
    augmentation (augmentation_utils.py:44-62). ``is_contact``: scalar bool —
    does this edge carry a contact relation."""
    kt, ka, k1, k2 = jax.random.split(key, 4)
    thres = jax.random.uniform(kt, (), minval=HAND_THRESHOLD, maxval=1.0)
    d = jnp.linalg.norm(points[:, None, :3] - hand_points[None, :, :], axis=-1).min(axis=1)
    zero_mask = is_contact & (d > thres)
    points = jnp.where(zero_mask[:, None], 0.0, points)

    points = _augment_crop(ka, points, OBJ_CFG)
    points = _augment_crop(k1, points, REL_CFG, subset_mask=points[:, 6] == 1)
    points = _augment_crop(k2, points, REL_CFG, subset_mask=points[:, 6] == 2)
    return points


@jax.jit
def augment_batch(key: jax.Array, batch):
    """Apply the reference augmentation with p=0.75 per scene.

    Returns a new SceneBatch with augmented obj_points / rel_points.
    """
    S, O = batch.obj_points.shape[:2]
    E = batch.rel_points.shape[1]
    k_apply, k_obj, k_rel = jax.random.split(key, 3)
    apply_mask = jax.random.uniform(k_apply, (S,)) < 0.75

    obj_keys = jax.random.split(k_obj, (S, O))
    new_obj = jax.vmap(jax.vmap(partial(_augment_crop, cfg=OBJ_CFG)))(obj_keys, batch.obj_points)
    rel_keys = jax.random.split(k_rel, (S, E))
    # contact-ness per edge works for both GT layouts: (S, E) int labels and
    # (S, E, R) multi-hot (MULTI_REL_OUTPUTS)
    if batch.gt_rels.ndim == 3:
        contact = batch.gt_rels[..., jnp.asarray(_CONTACT_IDS)].max(-1) > 0.5
    else:
        contact = jnp.isin(batch.gt_rels, jnp.asarray(_CONTACT_IDS))
    new_rel = jax.vmap(jax.vmap(_augment_rel_crop))(rel_keys, batch.rel_points, batch.rel_hand_points, contact)

    sel = apply_mask[:, None, None, None]
    return dataclasses.replace(
        batch,
        obj_points=jnp.where(sel, new_obj, batch.obj_points),
        rel_points=jnp.where(sel, new_rel, batch.rel_points),
    )
