"""L2: pose -> per-point instance labels, as a batched XLA projection op.

Reference: `compute_instance_labels.py` — per scan, project object boxes and
human skeletons onto the fused 6-Kinect cloud:

  * predicted path: one Group-Free box per class (best score), sizes *1000,
    heading sign flipped for operating_table / anesthesia_equipment
    (:158-184); box -> 20^3 grid point cloud (convert_oriented_box_to_pose
    :48-64);
  * per object: bbox prefilter -> FPS to 200 pts -> min distance < 75 ->
    label overwrite in object order (:186-200);
  * humans: skeleton -> limb-cylinder point cloud (radius 30), bbox grown by
    100 with an extra 100 along the head axis, a virtual edge point past the
    head, threshold 75 (compute_human_instance_labels :67-122);
  * hand exception: around the wrists (+-100 box), threshold 150, may
    overwrite background and the three table classes only (:108-120,
    :231-239);
  * outputs: instance_labels npz (int8) + human_name_to_3D_joints.

TPU design: the cdist tests run as one jitted masked-distance kernel over the
full cloud (pairwise-min over the 201 sample points), replacing the
scipy.cdist + 6-process fan-out; FPS uses the Pallas kernel.
"""

from __future__ import annotations

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

from or4d_tpu.config import IDX_TO_BODY_PART, LIMBS, OBJECT_LABEL_MAP, STATIONARY_OBJECTS

NPOINTS = 200  # compute_instance_labels.py:21
CLOSENESS_THRESHOLD = 75.0  # :22


def heading_to_rotmat(angle: float) -> np.ndarray:
    """Rotation about +y (heading2rotmat :37-46)."""
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float64)


def oriented_box_to_grid(box: np.ndarray) -> np.ndarray:
    """Oriented box (cx,cy,cz,l,w,h,heading) -> 20^3 grid point cloud
    (convert_oriented_box_to_pose :48-64; note the meshgrid x/y swap is
    immaterial for the downstream distance tests)."""
    ctr, lengths, heading = box[:3], box[3:6], box[6]
    g = [np.linspace(-lengths[i] / 2, lengths[i] / 2, 20) for i in range(3)]
    gx, gy, gz = np.meshgrid(*g)
    pts = np.stack([gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], axis=1)
    return pts @ heading_to_rotmat(heading).T + ctr


def skeleton_to_limb_points(joints: np.ndarray, radius: float = 30.0, segments: int = 16, rings_per_unit: float = 0.05) -> np.ndarray:
    """Skeleton -> limb-cylinder surface points (human_pose_to_joints /
    linemesh rebuild: one cylinder of the given radius per limb)."""
    pts = []
    for a, b in LIMBS:
        p0, p1 = joints[a], joints[b]
        axis = p1 - p0
        length = np.linalg.norm(axis)
        if length < 1e-6:
            continue
        axis = axis / length
        # orthonormal frame around the limb axis
        ref = np.array([1.0, 0.0, 0.0]) if abs(axis[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
        u = np.cross(axis, ref)
        u /= np.linalg.norm(u)
        v = np.cross(axis, u)
        n_rings = max(2, int(length * rings_per_unit))
        ts = np.linspace(0, length, n_rings)
        angs = np.linspace(0, 2 * np.pi, segments, endpoint=False)
        ring = np.outer(np.cos(angs), u) + np.outer(np.sin(angs), v)
        for t in ts:
            pts.append(p0 + axis * t + ring * radius)
    return np.concatenate(pts, axis=0)


@functools.partial(jax.jit, static_argnums=(3,))
def _close_mask(points: jax.Array, samples: jax.Array, bbox: jax.Array, threshold: float) -> jax.Array:
    """points (N, 3), samples (K, 3), bbox (2, 3) -> bool (N,):
    inside bbox AND min distance to samples < threshold."""
    inside = jnp.all((points >= bbox[0]) & (points <= bbox[1]), axis=1)
    from or4d_tpu.ops.ball_query import pairwise_sqdist

    d2 = pairwise_sqdist(points[None], samples[None])[0]  # (N, K)
    close = jnp.min(d2, axis=1) < threshold * threshold
    return inside & close


def _fps_sample(points: np.ndarray, n: int) -> np.ndarray:
    from or4d_tpu import ops

    idx = np.asarray(ops.furthest_point_sample(jnp.asarray(points[None], jnp.float32), n)[0])
    return points[idx]


def select_best_boxes(classes: np.ndarray, boxes: np.ndarray, scores: np.ndarray):
    """One box per class by best score; sizes *1000; heading sign fix for
    operating_table / anesthesia_equipment (:158-184)."""
    label_to_name = {v: k for k, v in OBJECT_LABEL_MAP.items()}
    out = []
    for cls in np.unique(classes):
        m = classes == cls
        best = boxes[m][scores[m].argmax()].astype(np.float64).copy()
        best[:6] *= 1000.0
        name = label_to_name[int(cls)]
        if name in ("operating_table", "anesthesia_equipment"):
            best[6] *= -1
        out.append((name, best))
    return out


def label_objects(points: np.ndarray, objects: list[tuple[str, np.ndarray]], instance_labels: np.ndarray) -> np.ndarray:
    """Project object grids onto the cloud, overwriting in object order."""
    pts = jnp.asarray(points, jnp.float32)
    for name, grid in objects:
        bbox = np.stack([grid.min(0), grid.max(0)])
        samples = _fps_sample(grid, NPOINTS)
        mask = np.asarray(_close_mask(pts, jnp.asarray(samples, jnp.float32), jnp.asarray(bbox, jnp.float32), CLOSENESS_THRESHOLD))
        instance_labels[mask] = OBJECT_LABEL_MAP[name]
    return instance_labels


def human_masks(points: np.ndarray, joints: np.ndarray):
    """compute_human_instance_labels(:67-122): body mask + hand-exception mask."""
    head = joints[0]
    feet_center = np.mean([joints[12], joints[13]], axis=0)
    main_axis = int(np.abs(head - feet_center).argmax())
    positive = (head - feet_center)[main_axis] > 0

    limb_pts = skeleton_to_limb_points(joints, radius=30.0)
    mn = limb_pts.min(0) - 100.0
    mx = limb_pts.max(0) + 100.0
    if positive:
        mx[main_axis] += 100.0
    else:
        mn[main_axis] -= 100.0

    samples = _fps_sample(limb_pts, NPOINTS)
    # virtual point past the head along the body axis (:97-103)
    if positive:
        edge = samples[samples[:, main_axis].argmax()].copy()
        edge[main_axis] += 100.0
    else:
        edge = samples[samples[:, main_axis].argmin()].copy()
        edge[main_axis] -= 100.0
    samples = np.concatenate([samples, edge[None]], axis=0)

    pts = jnp.asarray(points, jnp.float32)
    sam = jnp.asarray(samples, jnp.float32)
    body = np.asarray(_close_mask(pts, sam, jnp.asarray(np.stack([mn, mx]), jnp.float32), CLOSENESS_THRESHOLD))

    wrists = np.stack([joints[IDX_TO_BODY_PART.index("leftwrist")], joints[IDX_TO_BODY_PART.index("rightwrist")]])
    hb = np.stack([wrists.min(0) - 100.0, wrists.max(0) + 100.0])
    hands = np.asarray(_close_mask(pts, sam, jnp.asarray(hb, jnp.float32), CLOSENESS_THRESHOLD * 2))
    return body, hands


_HAND_OVERWRITABLE = (-1, OBJECT_LABEL_MAP["instrument_table"], OBJECT_LABEL_MAP["secondary_table"], OBJECT_LABEL_MAP["operating_table"])


def label_humans(points: np.ndarray, human_poses: dict[str, np.ndarray], instance_labels: np.ndarray) -> np.ndarray:
    """Apply body masks + the hand exception (overwrites background and the
    three table classes near the wrists, :231-239)."""
    for h_name, joints in human_poses.items():
        body, hands = human_masks(points, np.asarray(joints, np.float64))
        instance_labels[body] = OBJECT_LABEL_MAP[h_name]
        overwritable = np.isin(instance_labels, _HAND_OVERWRITABLE)
        instance_labels[hands & overwritable] = OBJECT_LABEL_MAP[h_name]
    return instance_labels


def load_gt_objects(root, take_idx, pcd_idx: str, pose_subdir: str = "vs_0.01_rf_0.25_maxnn_500_ft_0.25"):
    """GT-object path (compute_instance_labels.py:139-156): registered object
    scans (per-scan npz of {ply_path: 4x4 transform}) merged with the take's
    stationary objects, minus the manual json's false_objects; each entry
    becomes (name, transformed scan points).

    Paths inside the npz are reference-release relative
    ('datasets/4D-OR/object_scans/{name}/{take}.ply'); they are re-rooted
    onto ``root``/object_scans.
    """
    from pathlib import Path as _P

    from or4d_tpu.data.pcd_io import load_registered_object_scan

    root = _P(root)
    poses_dir = root / "object_pose_results" / pose_subdir
    registered = np.load(str(poses_dir / f"{take_idx}_{pcd_idx}.npz"), allow_pickle=True)["arr_0"].item()
    stationary = {k: v for k, v in np.load(str(poses_dir / f"{take_idx}_stationary_objects.npz"),
                                           allow_pickle=True)["arr_0"]}
    # faithful take-10 quirk: string comparison includes the '.pcd' suffix,
    # so the nudge applies from scan 000198 onward (:146-147)
    if f"{pcd_idx}.pcd" > "000198" and int(take_idx) == 10:
        key = next((k for k in stationary if "secondary_table" in k), None)
        if key is not None:
            stationary[key] = np.array(stationary[key], np.float64)
            stationary[key][:3, 3] += [-0.05, 0, -0.05]
    registered = {k: v for k, v in registered.items() if k.split("/")[3] not in STATIONARY_OBJECTS}
    registered = {**registered, **stationary}

    false_objects: set = set()
    manual = poses_dir / f"{take_idx}_{pcd_idx}_manual.json"
    if manual.exists():
        false_objects = set(json.loads(manual.read_text()).get("false_objects", []))

    objects = []
    for path_str, transform in registered.items():
        name = path_str.split("/")[3]
        if name in false_objects:
            continue
        ply = root / "object_scans" / name / _P(path_str).name
        pts = load_registered_object_scan(ply, np.array(transform, np.float64))
        objects.append((name, pts[:, :3]))
    return objects


def load_gt_humans(root, take_idx, pcd_idx: str) -> dict[str, np.ndarray]:
    """GT-human path (compute_instance_labels.py:205-230): the annotation
    json's per-joint labels -> 14-joint poses in the OR-4D frame; humans are
    renamed human_0.. in sorted humanName order, Patient keeps its name."""
    from pathlib import Path as _P

    from or4d_tpu.data.cameras import coord_transform_pose_tool_to_or4d

    p = _P(root) / f"export_holistic_take{take_idx}_processed" / "annotations" / f"{pcd_idx}.json"
    out: dict[str, np.ndarray] = {}
    if not p.exists():
        return out
    labels = json.loads(p.read_text())["labels"]
    h_idx = 0
    for human_name in sorted({e["humanName"] for e in labels}):
        joint_pos = {}
        for e in labels:
            if e["humanName"] == human_name:
                loc = e["point3d"]["location"]
                joint_pos[e["jointName"]] = (loc["x"], loc["y"], loc["z"])
        pose = np.asarray([joint_pos[bp] for bp in IDX_TO_BODY_PART], np.float64)
        pose = coord_transform_pose_tool_to_or4d(pose)
        if human_name == "Patient":
            out["Patient"] = pose
        else:
            out[f"human_{h_idx}"] = pose
            h_idx += 1
    return out


def process_take(root, take_idx, from_gt: bool = False, out_root=None,
                 boxes_dir=None, poses_dir=None) -> int:
    """Per-take L2 driver (_process_take_helper :125-266): label every scan
    of the take and write the two artifacts the downstream layers consume —
    instance_labels{,_pred}/{take}_{scan}.npz and
    human_name_to_3D_joints/{take}_GT_{from_gt}.npz.

    The reference fans takes over 6 processes (process_map :270-271); here
    the per-scan distance tests are batched jitted TPU kernels, so takes run
    sequentially on one chip (one process per chip is the valid-timing rule
    anyway) and multi-chip scale comes from sharding takes across hosts.
    """
    from pathlib import Path as _P

    from or4d_tpu.data.pcd_io import read_pcd
    from or4d_tpu.pipeline.perception_infer import load_boxes_npz

    root = _P(root)
    out_root = _P(out_root) if out_root else root
    label_dir = out_root / ("instance_labels" if from_gt else "instance_labels_pred")
    label_dir.mkdir(parents=True, exist_ok=True)
    joints_dir = out_root / "human_name_to_3D_joints"
    joints_dir.mkdir(parents=True, exist_ok=True)

    pcd_paths = sorted((root / f"export_holistic_take{take_idx}_processed" / "pcds").glob("*.pcd"))
    all_joints: dict[str, dict] = {}
    count = 0
    for pcd_path in pcd_paths:
        pcd_idx = pcd_path.stem
        points = read_pcd(pcd_path)[:, :3]
        if from_gt:
            objects = load_gt_objects(root, take_idx, pcd_idx)
            human_poses = load_gt_humans(root, take_idx, pcd_idx)
            boxes = None
        else:
            objects = None
            boxes_npz = _P(boxes_dir or (root / "group_free_predictions")) / f"{take_idx}_{pcd_idx}.npz"
            boxes = None
            if boxes_npz.exists():
                loaded = load_boxes_npz(boxes_npz)
                boxes = {"classes": loaded["classes_nms"], "bboxes": loaded["bboxes_nms"],
                         "scores": loaded["scores_nms"]}
            human_poses = {}
            pose_npy = _P(poses_dir or (root / "OR_4D_outputs")) / f"pred_{take_idx}_{pcd_idx}.npy"
            if pose_npy.exists():
                for h_idx, pose in enumerate(np.load(str(pose_npy))):
                    human_poses[f"human_{h_idx}"] = pose
        labels = compute_instance_labels_for_scan(points, boxes=boxes, human_poses=human_poses, objects=objects)
        np.savez_compressed(str(label_dir / f"{take_idx}_{pcd_idx}.npz"), labels)
        all_joints[pcd_idx] = human_poses
        count += 1
    np.savez_compressed(str(joints_dir / f"{take_idx}_GT_{from_gt}.npz"), all_joints)
    return count


def compute_instance_labels_for_scan(
    points: np.ndarray,
    boxes: dict | None = None,
    human_poses: dict[str, np.ndarray] | None = None,
    objects: list[tuple[str, np.ndarray]] | None = None,
) -> np.ndarray:
    """Full per-scan path: (predicted boxes | prebuilt object grids) then
    humans. ``boxes``: {'classes': (K,), 'bboxes': (K, 7), 'scores': (K,)}.
    Returns int8 labels (N,), -1 = background."""
    labels = np.full(len(points), -1, np.int8)
    if objects is None and boxes is not None:
        objects = [(name, oriented_box_to_grid(b)) for name, b in select_best_boxes(boxes["classes"], boxes["bboxes"], boxes["scores"])]
    if objects:
        labels = label_objects(points, objects, labels)
    if human_poses:
        labels = label_humans(points, human_poses, labels)
    return labels
