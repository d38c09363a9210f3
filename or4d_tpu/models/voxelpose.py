"""VoxelPose — multi-view 3D human pose estimation, TPU-native.

Reference: `external_src/voxelpose/voxelpose_lib/models/*` adapted to 4D-OR:
  * ProjectLayer (project_layer.py:15-109): a voxel grid over the OR space
    (8000^3 mm cube centered (296.1, 826.0, -190.4), 80^3 bins) is projected
    into each of the 6 cameras and bilinearly samples the per-camera 2D joint
    heatmaps; samples are averaged over the cameras whose image bounds
    contain the projection, clamped to [0, 1];
  * CuboidProposalNet: V2VNet(num_joints -> 1) over the fused cube proposes
    person centers; 3D max-pool NMS + top-K (core/proposal.py:24-40,
    MAX_PEOPLE_NUM 10);
  * PoseRegressionNet: per proposal, a fine 2000^3 mm / 56^3 grid is
    re-projected and V2VNet(num_joints -> num_joints) + beta-softmax
    soft-argmax over the grid regresses the 14 joints
    (pose_regression_net.py:15-55);
  * training loss: per-joint L1 with patient weighting x4
    (multi_person_posenet.py:36-103).

TPU design: everything is batched/jittable with static shapes — the per-
proposal loop becomes a vmap over the top-K proposals (invalid proposals are
masked, not skipped), and grid_sample is an explicit bilinear gather.
V2V 3D convs are channels-last `lax.conv_general_dilated` calls.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

SPACE_SIZE = (8000.0, 8000.0, 8000.0)
SPACE_CENTER = (296.1, 826.0, -190.4)
INITIAL_CUBE = (80, 80, 80)
FINE_GRID = (2000.0, 2000.0, 2000.0)
FINE_CUBE = (56, 56, 56)
NUM_JOINTS = 14
MAX_PEOPLE = 10


@dataclasses.dataclass
class Camera:
    """Pinhole camera: world -> pixel (the distortion-free OR_4D projection,
    voxelpose OR_4D.py camera handling)."""

    R: np.ndarray  # (3, 3) world->cam rotation
    T: np.ndarray  # (3,) camera center in world coords
    f: np.ndarray  # (2,) focal
    c: np.ndarray  # (2,) principal point
    width: int = 2048
    height: int = 1536


def project_points(points: jax.Array, R: jax.Array, T: jax.Array, f: jax.Array, c: jax.Array) -> jax.Array:
    """(N, 3) world -> (N, 2) pixel coordinates."""
    cam = (points - T) @ R.T
    z = jnp.maximum(cam[:, 2:3], 1e-6)
    return cam[:, :2] / z * f + c


def compute_grid(box_size, box_center, n_bins) -> jax.Array:
    """Reference compute_grid (project_layer.py:29-47): meshgrid of bin
    centers, x-major flattening."""
    axes = [jnp.linspace(-box_size[i] / 2, box_size[i] / 2, n_bins[i]) + box_center[i] for i in range(3)]
    gx, gy, gz = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], axis=1)


def bilinear_sample(hm: jax.Array, uv: jax.Array) -> jax.Array:
    """heatmap (J, H, W), uv (N, 2) in pixel coords of the heatmap ->
    (J, N). align_corners=True grid_sample semantics with zero padding."""
    J, H, W = hm.shape
    x = uv[:, 0]
    y = uv[:, 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = x - x0
    wy = y - y0

    def tap(yi, xi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = hm[:, jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(inb[None, :], v, 0.0)

    return (
        tap(y0, x0) * ((1 - wx) * (1 - wy))[None]
        + tap(y0, x1) * (wx * (1 - wy))[None]
        + tap(y1, x0) * ((1 - wx) * wy)[None]
        + tap(y1, x1) * (wx * wy)[None]
    )


def project_heatmaps_to_cube(
    heatmaps: jax.Array,  # (C, J, H, W) per-camera 2D joint heatmaps
    cameras: dict[str, jax.Array],  # R (C,3,3), T (C,3), f (C,2), c (C,2), size (C,2)
    grid: jax.Array,  # (nbins, 3) world-space bin centers
    heatmap_scale: jax.Array,  # (2,) heatmap_size / image_size
) -> jax.Array:
    """The fused-cube construction (get_voxel :49-105): per camera, project,
    bound-check, bilinear sample; bounded average over cameras; clamp."""

    def per_cam(hm, R, T, f, c, size):
        xy = project_points(grid, R, T, f, c)
        inb = (xy[:, 0] >= 0) & (xy[:, 1] >= 0) & (xy[:, 0] < size[0]) & (xy[:, 1] < size[1])
        uv = jnp.clip(xy, -1.0, jnp.max(size).astype(xy.dtype)) * heatmap_scale
        return bilinear_sample(hm, uv), inb

    samples, bounding = jax.vmap(per_cam)(
        heatmaps, cameras["R"], cameras["T"], cameras["f"], cameras["c"], cameras["size"]
    )  # (C, J, nbins), (C, nbins)
    b = bounding[:, None, :].astype(samples.dtype)
    cube = jnp.sum(samples * b, axis=0) / (jnp.sum(b, axis=0) + 1e-6)
    return jnp.clip(cube, 0.0, 1.0)  # (J, nbins)


class Basic3D(nn.Module):
    features: int
    ksize: int

    @nn.compact
    def __call__(self, x, train=True):
        x = nn.Conv(self.features, (self.ksize,) * 3, padding="SAME", name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return nn.relu(x)


class Res3D(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train=True):
        r = nn.Conv(self.features, (3, 3, 3), padding="SAME", name="conv1")(x)
        r = nn.BatchNorm(use_running_average=not train, name="bn1")(r)
        r = nn.relu(r)
        r = nn.Conv(self.features, (3, 3, 3), padding="SAME", name="conv2")(r)
        r = nn.BatchNorm(use_running_average=not train, name="bn2")(r)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1, 1), name="skip_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, name="skip_bn")(x)
        return nn.relu(r + x)


class Up3D(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train=True):
        x = nn.ConvTranspose(self.features, (2, 2, 2), strides=(2, 2, 2), name="deconv")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return nn.relu(x)


def _pool3d(x):
    return nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))


class V2VNet(nn.Module):
    """v2v_net.py:73-144 — hourglass 3D CNN (channels-last (D,H,W,C))."""

    out_channels: int

    @nn.compact
    def __call__(self, x, train=True):
        x = Basic3D(16, 7, name="front1")(x, train)
        x = Res3D(32, name="front2")(x, train)

        s1 = Res3D(32, name="skip1")(x, train)
        x = _pool3d(x)
        x = Res3D(64, name="enc1")(x, train)
        s2 = Res3D(64, name="skip2")(x, train)
        x = _pool3d(x)
        x = Res3D(128, name="enc2")(x, train)
        x = Res3D(128, name="mid")(x, train)
        x = Res3D(128, name="dec2")(x, train)
        x = Up3D(64, name="up2")(x, train) + s2
        x = Res3D(64, name="dec1")(x, train)
        x = Up3D(32, name="up1")(x, train) + s1

        return nn.Conv(self.out_channels, (1, 1, 1), name="output")(x)


def nms_topk(cube: jax.Array, k: int = MAX_PEOPLE) -> tuple[jax.Array, jax.Array]:
    """3D max-pool NMS + top-k (core/proposal.py:24-40): keep local maxima,
    return (values, (k, 3) voxel indices)."""
    D, H, W = cube.shape
    x = cube[None, ..., None]
    mx = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding="SAME")[0, ..., 0]
    kept = jnp.where(cube == mx, cube, 0.0).reshape(-1)
    vals, idx = jax.lax.top_k(kept, k)
    ix = idx // (H * W)
    iy = (idx % (H * W)) // W
    iz = idx % W
    return vals, jnp.stack([ix, iy, iz], axis=1)


def voxel_to_world(index: jax.Array, cube_size=INITIAL_CUBE, grid_size=SPACE_SIZE, grid_center=SPACE_CENTER) -> jax.Array:
    """ProposalLayer.get_real_loc (cuboid_proposal_net.py:41-47)."""
    cs = jnp.asarray(cube_size, jnp.float32)
    gs = jnp.asarray(grid_size, jnp.float32)
    gc = jnp.asarray(grid_center, jnp.float32)
    return index.astype(jnp.float32) / (cs - 1) * gs + gc - gs / 2.0


class VoxelPose(nn.Module):
    """Full multi-person net (multi_person_posenet.py:36-103), static shapes:
    always MAX_PEOPLE proposals, invalid ones masked by score threshold."""

    num_joints: int = NUM_JOINTS
    beta: float = 100.0
    threshold: float = 0.1
    # reference geometry (configs/4d_or/config.yaml); overridable so tests
    # and small deployments can shrink the voxel grids without touching the
    # architecture
    space_size: tuple = SPACE_SIZE
    space_center: tuple = SPACE_CENTER
    initial_cube: tuple = INITIAL_CUBE
    fine_grid: tuple = FINE_GRID
    fine_cube: tuple = FINE_CUBE
    max_people: int = MAX_PEOPLE

    @nn.compact
    def __call__(self, heatmaps, cameras, heatmap_scale, train: bool = True):
        """heatmaps (C, J, H, W); cameras dict of stacked per-camera params.
        Returns (poses (K, J, 3), scores (K,), root_cube (80,80,80))."""
        coarse_grid = compute_grid(self.space_size, self.space_center, self.initial_cube)
        cube = project_heatmaps_to_cube(heatmaps, cameras, coarse_grid, heatmap_scale)
        cube = cube.reshape(self.num_joints, *self.initial_cube)

        root = V2VNet(1, name="proposal_v2v")(
            jnp.transpose(cube, (1, 2, 3, 0))[None], train
        )[0, ..., 0]  # (80, 80, 80)
        scores, vox_idx = nms_topk(root, self.max_people)
        centers = voxel_to_world(vox_idx, self.initial_cube, self.space_size, self.space_center)

        def project_one(center):
            grid = compute_grid(self.fine_grid, center, self.fine_cube)
            fine = project_heatmaps_to_cube(heatmaps, cameras, grid, heatmap_scale)
            return jnp.transpose(fine.reshape(self.num_joints, *self.fine_cube), (1, 2, 3, 0)), grid

        # projection is pure -> vmap; the V2V net runs ONCE with the K
        # proposals as its batch axis (a flax module with BatchNorm cannot be
        # jax.vmap'ed in train mode — the batch_stats mutation escapes the
        # trace). Deviation from the reference's per-proposal loop: train-mode
        # BN statistics pool over all K proposals instead of per-proposal
        # batches of 1 (eval mode uses running stats and is exactly
        # equivalent).
        fine, grids = jax.vmap(project_one)(centers)  # (K, D, H, W, J), (K, nbins, 3)
        out = V2VNet(self.num_joints, name="pose_v2v")(fine, train)  # (K, D, H, W, J)
        logits = jnp.transpose(out, (0, 4, 1, 2, 3)).reshape(centers.shape[0], self.num_joints, -1)
        w = jax.nn.softmax(self.beta * logits, axis=-1)  # soft-argmax
        poses = jnp.einsum("kjn,knd->kjd", w, grids)  # (K, J, 3)
        return poses, scores, centers, root


MATCH_RADIUS = 500.0  # ProposalLayer.filter_proposal's validity gate (mm)


def match_proposals_to_gt(centers, gt_roots, gt_mask, radius: float = MATCH_RADIUS):
    """ProposalLayer.filter_proposal (cuboid_proposal_net.py:25-40): each
    PROPOSAL takes its nearest GT root (so several proposals may share one
    GT — intended); proposals farther than 500mm from every GT are invalid.
    Returns (cand2gt (K,) int, valid (K,) bool)."""
    d = jnp.linalg.norm(centers[:, None, :] - gt_roots[None, :, :], axis=-1)  # (K, G)
    d = jnp.where(gt_mask[None, :], d, jnp.inf)
    cand2gt = jnp.argmin(d, axis=1)
    valid = jnp.min(d, axis=1) <= radius
    return cand2gt, valid


def voxelpose_loss_3d(root_cube, target_3d):
    """loss_3d: plain mean-MSE of the proposal net's root cube against the
    3D root-gaussian target (multi_person_posenet.py:57,69-71 with
    PerJointMSELoss/nn.MSELoss(reduction='mean')). This is the only loss
    that reaches the proposal V2V net — grid centers flow through top-k
    indices, which carry no gradient."""
    return jnp.mean((root_cube - target_3d) ** 2)


def voxelpose_loss(
    pred_poses,
    centers,
    gt_roots,
    gt_poses,
    gt_vis,
    gt_mask,
    patient_slot_mask=None,
    patient_weight: float = 4.0,
):
    """The reference training loss (multi_person_posenet.py:75-103 +
    PerJointL1Loss): per valid proposal, weighted-L1 against its matched GT
    — weights are the per-joint visibility, x PATIENT_WEIGHT when the
    PROPOSAL SLOT's patient flag is set (the reference indexes
    is_patient_masks[i, n] by candidate index n, not by the matched GT —
    quirk preserved) — running-averaged over contributing proposals.

    Shapes: pred_poses/centers (K, J, 3)/(K, 3); gt_roots (G, 3);
    gt_poses (G, J, 3); gt_vis (G, J); gt_mask (G,) bool;
    patient_slot_mask (K,) bool."""
    K = pred_poses.shape[0]
    cand2gt, valid = match_proposals_to_gt(centers, gt_roots, gt_mask)
    matched = gt_poses[cand2gt]  # (K, J, 3)
    w = gt_vis[cand2gt].astype(pred_poses.dtype)[..., None]  # (K, J, 1)
    if patient_slot_mask is not None:
        w = w * jnp.where(patient_slot_mask, patient_weight, 1.0)[:, None, None]
    # PerJointL1Loss(use_target_weight): MEAN over all (J, 3) elements of
    # w * |pred - gt| per candidate, then equal-weight average over matched
    # candidates (the reference's running (count-1)/count update)
    per_cand = jnp.mean(jnp.abs(pred_poses - matched) * w, axis=(1, 2))  # (K,)
    v = valid.astype(pred_poses.dtype)
    return jnp.sum(per_cand * v) / jnp.maximum(jnp.sum(v), 1.0)
