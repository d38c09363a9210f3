"""Generate the tiny real-format dataset fixture under tests/golden/real_data.

The tree mirrors the 4D-OR release layout (helpers/configurations.py:48-61):
    relationships_train.json / relationships_validation.json
    export_holistic_take{T}_processed/pcds/{S}.pcd
    instance_labels/{T}_{S}.npz          (GT per-point labels, int8)
    instance_labels_pred/{T}_{S}.npz     (predicted labels, human ids permuted)
    human_name_to_3D_joints/{T}_GT_True.npz

Scenes are synthetic but in real-format files at OR-scale coordinates, so
the full ingest path (pcd parse -> label load -> human matching -> virtual
objects -> prep) runs exactly as it would on the released dataset.

Deterministic; run `python tests/golden/make_real_fixture.py` to regenerate.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from or4d_tpu.config import DEPTH_SCALING, LIMBS, OBJECT_LABEL_MAP
from or4d_tpu.data.cameras import coord_transform_or4d_to_pose_tool
from or4d_tpu.data.pcd_io import write_pcd

POSE_SUBDIR = "vs_0.01_rf_0.25_maxnn_500_ft_0.25"
# pose-tool joint names (annotation jsons) in IDX_TO_BODY_PART order
BODY_PARTS = [
    "head", "neck", "leftshoulder", "rightshoulder", "lefthip", "righthip",
    "leftelbow", "rightelbow", "leftwrist", "rightwrist", "leftknee",
    "rightknee", "leftfoot", "rightfoot",
]

ROOT = Path(__file__).resolve().parent / "real_data"

# object blob centers at OR-scale coordinates (the export space where the
# virtual instrument box sits at [-200, 1056, -66])
OBJ_CENTERS = {
    "anesthesia_equipment": [-900.0, 700.0, 900.0],
    "operating_table": [0.0, 500.0, 0.0],
    "instrument_table": [800.0, 650.0, -500.0],
    "secondary_table": [900.0, 650.0, 800.0],
}


def make_skeleton(rng: np.random.Generator, center: np.ndarray, lying: bool = False) -> np.ndarray:
    """A plausible 14-joint skeleton (IDX_TO_BODY_PART order) around center."""
    # canonical standing pose, y-up, ~380-unit tall torso
    pose = np.array([
        [0, 380, 0],      # head
        [0, 300, 0],      # neck
        [-80, 280, 0],    # leftshoulder
        [80, 280, 0],     # rightshoulder
        [-60, 60, 0],     # lefthip
        [60, 60, 0],      # righthip
        [-110, 180, 30],  # leftelbow
        [110, 180, 30],   # rightelbow
        [-130, 90, 60],   # leftwrist
        [130, 90, 60],    # rightwrist
        [-60, -120, 10],  # leftknee
        [60, -120, 10],   # rightknee
        [-60, -300, 0],   # leftfoot
        [60, -300, 0],    # rightfoot
    ], dtype=np.float64)
    if lying:
        pose = pose[:, [1, 2, 0]]  # body axis along x instead of y
    return pose + center + rng.normal(scale=5.0, size=(14, 3))


def skeleton_points(rng: np.random.Generator, joints: np.ndarray, per_limb: int = 40) -> np.ndarray:
    pts = []
    for a, b in LIMBS:
        t = rng.uniform(0, 1, size=(per_limb, 1))
        seg = joints[a] * (1 - t) + joints[b] * t
        pts.append(seg + rng.normal(scale=25.0, size=(per_limb, 3)))
    return np.concatenate(pts)


def blob(rng: np.random.Generator, center, n: int, scale=150.0) -> np.ndarray:
    return np.asarray(center) + rng.normal(scale=scale, size=(n, 3))


def build_scan(take_idx: int, pcd_idx: str, objects: dict[str, str], rels, humans: dict,
               missing: set[str], seed: int):
    """Write one scan's pcd + GT/pred labels; returns human joints dict."""
    rng = np.random.default_rng(seed)
    pts, gt, colors = [], [], []

    # background floor/walls
    nbg = 800
    bg = np.stack([rng.uniform(-1500, 1500, nbg), rng.uniform(0, 60, nbg), rng.uniform(-1200, 1500, nbg)], axis=1)
    pts.append(bg)
    gt.append(np.full(nbg, -1))
    colors.append(rng.uniform(0.3, 0.6, size=(nbg, 3)))

    joints_by_name = {}
    human_centers = {"Patient": np.array([0.0, 620.0, 0.0])}
    free = [np.array([-420.0, 350.0, 300.0]), np.array([350.0, 350.0, -350.0]), np.array([-300.0, 350.0, -600.0])]
    for name in objects.values():
        if name in missing or name == "instrument":
            continue
        if name in OBJ_CENTERS:
            n = 320
            pts.append(blob(rng, OBJ_CENTERS[name], n))
            gt.append(np.full(n, OBJECT_LABEL_MAP[name]))
            colors.append(np.broadcast_to(rng.uniform(0.2, 0.9, 3), (n, 3)).copy())
        else:  # a human
            center = human_centers.get(name)
            if center is None:
                center = free.pop(0)
            j = make_skeleton(rng, center, lying=(name == "Patient"))
            joints_by_name[name] = j
            sk = skeleton_points(rng, j)
            pts.append(sk)
            gt.append(np.full(len(sk), OBJECT_LABEL_MAP[name]))
            colors.append(np.broadcast_to(rng.uniform(0.4, 1.0, 3), (len(sk), 3)).copy())

    xyz = np.concatenate(pts).astype(np.float32)
    gt = np.concatenate(gt).astype(np.int8)
    rgb = np.clip(np.concatenate(colors), 0, 1).astype(np.float32)

    # predicted labels: same blobs but with human identities cyclically
    # permuted and ~2% of points flipped to background — exercises
    # match_human_labels_to_gt end to end
    pred = gt.copy()
    human_ids = sorted({OBJECT_LABEL_MAP[n] for n in joints_by_name})
    if len(human_ids) > 1:
        perm = {a: b for a, b in zip(human_ids, human_ids[1:] + human_ids[:1])}
        pred = gt.copy()
        for a, b in perm.items():
            pred[gt == a] = b
    drop = rng.uniform(0, 1, len(pred)) < 0.02
    pred[drop] = -1

    order = rng.permutation(len(xyz))
    xyz, gt, pred, rgb = xyz[order], gt[order], pred[order], rgb[order]

    pcd_dir = ROOT / f"export_holistic_take{take_idx}_processed" / "pcds"
    pcd_dir.mkdir(parents=True, exist_ok=True)
    write_pcd(pcd_dir / f"{pcd_idx}.pcd", np.concatenate([xyz, rgb], axis=1), binary=(int(pcd_idx) % 2 == 0))
    (ROOT / "instance_labels").mkdir(exist_ok=True)
    (ROOT / "instance_labels_pred").mkdir(exist_ok=True)
    np.savez_compressed(ROOT / "instance_labels" / f"{take_idx}_{pcd_idx}.npz", gt)
    np.savez_compressed(ROOT / "instance_labels_pred" / f"{take_idx}_{pcd_idx}.npz", pred)
    return joints_by_name


def write_ply(path: Path, xyz: np.ndarray):
    """Minimal binary_little_endian PLY with x/y/z float properties."""
    path.parent.mkdir(parents=True, exist_ok=True)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(xyz)}\n"
        "property float x\nproperty float y\nproperty float z\nend_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(np.ascontiguousarray(xyz, np.float32).tobytes())


# fixture color frames are 256x192 — the release's 2048x1536 at 1/8 scale;
# 2D keypoint annotations are written in THIS pixel space so image size and
# annotation coordinates stay consistent (the dataset-format contract)
FIXTURE_IMAGE_SIZE = (256, 192)
FIXTURE_IMAGE_SCALE = FIXTURE_IMAGE_SIZE[0] / 2048.0


def write_color_frames(take_idx: int, pcd_indices: list[str]):
    """6-camera jpgs + timestamp_to_pcd_and_frames_list.json, the inputs of
    load_full_image_data (data_preparation_utils.py:296-310). Frames are
    small gradients with per-camera hue so the transform/crop path has real
    jpg decoding to chew on; the json is a LIST indexed by int(pcd_idx)."""
    from PIL import Image

    take_root = ROOT / f"export_holistic_take{take_idx}_processed"
    color_dir = take_root / "colorimage"
    color_dir.mkdir(parents=True, exist_ok=True)
    frames_list = []
    for pcd_idx in sorted(pcd_indices, key=int):
        assert int(pcd_idx) == len(frames_list), "frames list must be index-addressable"
        color_idx = f"{int(pcd_idx) + 100:06d}"  # offset: color indices != pcd indices
        entry = {"pcd": pcd_idx}
        for c_idx in range(1, 7):
            entry[f"color_{c_idx}"] = color_idx
            w, h = FIXTURE_IMAGE_SIZE
            xx, yy = np.meshgrid(np.linspace(0, 255, w), np.linspace(0, 255, h))
            rgb = np.stack([
                (xx + 20 * c_idx) % 256,
                (yy + 35 * int(pcd_idx)) % 256,
                np.full_like(xx, (c_idx * 40) % 256),
            ], axis=-1).astype(np.uint8)
            Image.fromarray(rgb).save(color_dir / f"camera0{c_idx}_colorimage-{color_idx}.jpg")
        frames_list.append([f"ts_{pcd_idx}", entry])
    (take_root / "timestamp_to_pcd_and_frames_list.json").write_text(json.dumps(frames_list))


def _quat_xyzw(R: np.ndarray) -> dict:
    from scipy.spatial.transform import Rotation

    q = Rotation.from_matrix(R).as_quat()  # xyzw
    return {"x": float(q[0]), "y": float(q[1]), "z": float(q[2]), "w": float(q[3])}


def _look_at_extrinsics(pos: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Camera pose (cam -> world) whose -z axis looks at target — the
    orientation the voxelpose projection (inv(extrinsics) then
    diag(1,-1,-1)) maps to +z-forward image coordinates, y down."""
    f = target - pos
    f = f / np.linalg.norm(f)
    x = np.cross(f, [0.0, 1.0, 0.0])
    x = x / np.linalg.norm(x)
    z = -f
    y = np.cross(z, x)
    ext = np.eye(4)
    ext[:3, :3] = np.stack([x, y, z], axis=1)
    ext[:3, 3] = pos
    return ext


def write_cameras_and_2d(take_idx: int, pcd_indices: list[str], joints_by_scan: dict):
    """camera0{i}.json calibration files (helpers/utils.py load_cam_infos
    schema) + 2D_keypoint_annotations.json with per-camera projections of
    the fixture skeletons (the inputs of the HigherHRNet OR_4D dataset and
    the VoxelPose db builder)."""
    from or4d_tpu.data.cameras import cam_infos_to_voxelpose, load_cam_infos
    from or4d_tpu.data.voxelpose_dataset import IMAGE_SIZE, project_to_camera

    take_root = ROOT / f"export_holistic_take{take_idx}_processed"
    take_root.mkdir(parents=True, exist_ok=True)
    fx = fy = 900.0
    cx, cy = 1024.0, 768.0
    ident_rot = {"x": 0.0, "y": 0.0, "z": 0.0, "w": 1.0}
    zero_t = {"m00": 0.0, "m10": 0.0, "m20": 0.0}
    # 6 cameras on a 5 m circle at 3 m height, looking at the table (meters:
    # OR_4D export coords / 500)
    target = np.array([0.0, 500.0, 0.0]) / 500.0
    for c_idx in range(1, 7):
        ang = 2 * np.pi * (c_idx - 1) / 6 + 0.3
        pos = np.array([5.0 * np.cos(ang), 3.0, 5.0 * np.sin(ang)])
        ext = _look_at_extrinsics(pos, target)
        data = {
            "value0": {
                "camera_pose": {
                    "rotation": _quat_xyzw(ext[:3, :3]),
                    "translation": {"m00": pos[0], "m10": pos[1], "m20": pos[2]},
                },
                "color2depth_transform": {"rotation": ident_rot, "translation": zero_t},
                "color_parameters": {
                    "intrinsics_matrix": {
                        "m00": fx, "m10": 0.0, "m20": cx,
                        "m01": 0.0, "m11": fy, "m21": cy,
                        "m02": 0.0, "m12": 0.0, "m22": 1.0,
                    },
                    "fov_x": fx, "fov_y": fy, "c_x": cx, "c_y": cy,
                    "width": 2048, "height": 1536,
                    "radial_distortion": {f"m{i}0": 0.0 for i in range(6)},
                    "tangential_distortion": {"m00": 0.0, "m10": 0.0},
                },
            }
        }
        (take_root / f"camera0{c_idx}.json").write_text(json.dumps(data))

    cameras = cam_infos_to_voxelpose(load_cam_infos(take_root))
    ann = {}
    for pcd_idx in pcd_indices:
        for c_idx in range(1, 7):
            entries = []
            for name, joints in joints_by_scan[pcd_idx].items():
                xy = project_to_camera(np.asarray(joints, np.float64), cameras, c_idx - 1)
                vis = (
                    (xy[:, 0] >= 0) & (xy[:, 0] <= IMAGE_SIZE[0] - 1)
                    & (xy[:, 1] >= 0) & (xy[:, 1] <= IMAGE_SIZE[1] - 1)
                ).astype(float) * 2.0
                # keypoints live in the jpg pixel space (release: 2048x1536;
                # fixture jpgs are 1/8 scale)
                xy = xy * FIXTURE_IMAGE_SCALE
                kpts = np.concatenate([xy, vis[:, None]], axis=1).reshape(-1).tolist()
                x0, y0 = xy.min(axis=0)
                x1, y1 = xy.max(axis=0)
                entries.append({"keypoints": kpts, "bbox": [x0, y0, x1 - x0, y1 - y0], "human_name": name})
            ann[f"{pcd_idx}_{c_idx}"] = entries
    (take_root / "2D_keypoint_annotations.json").write_text(json.dumps(ann))


def write_l2_gt_artifacts(take_idx: int, pcd_indices: list[str], objects_per_scan: dict[str, list[str]],
                          joints_by_scan: dict[str, dict]):
    """Registered object scans + pose npzs + manual jsons + annotation jsons
    so the L2 GT path (compute_instance_labels.py:139-156,205-230) runs on
    the fixture. Paths inside the npzs use the reference-release prefix."""
    rng = np.random.default_rng(take_idx * 33 + 7)
    poses_dir = ROOT / "object_pose_results" / POSE_SUBDIR
    poses_dir.mkdir(parents=True, exist_ok=True)
    stationary_names = ["instrument_table", "secondary_table"]

    all_names = sorted({n for names in objects_per_scan.values() for n in names if n in OBJ_CENTERS})
    transforms = {}
    for name in all_names + ["object"]:  # 'object' = the false-positive probe
        local = rng.normal(scale=150.0, size=(400, 3))
        write_ply(ROOT / "object_scans" / name / f"{take_idx}.ply", local)
        t = np.eye(4)
        center = OBJ_CENTERS.get(name, [0.0, 300.0, 0.0])
        t[:3, 3] = np.asarray(center) / DEPTH_SCALING  # get_object_poses re-scales
        transforms[name] = t

    stationary = np.array(
        [(f"datasets/4D-OR/object_scans/{n}/{take_idx}.ply", transforms[n])
         for n in stationary_names if n in transforms],
        dtype=object,
    )
    np.savez_compressed(poses_dir / f"{take_idx}_stationary_objects.npz", stationary)

    for pcd_idx in pcd_indices:
        registered = {
            f"datasets/4D-OR/object_scans/{n}/{take_idx}.ply": transforms[n].copy()
            for n in objects_per_scan[pcd_idx]
            if n in transforms and n not in stationary_names
        }
        # a registered false object that the manual json rejects
        registered[f"datasets/4D-OR/object_scans/object/{take_idx}.ply"] = transforms["object"].copy()
        np.savez_compressed(poses_dir / f"{take_idx}_{pcd_idx}.npz", registered)
        (poses_dir / f"{take_idx}_{pcd_idx}_manual.json").write_text(json.dumps({"false_objects": ["object"]}))

        # annotation json: world joints -> pose-tool frame, humanNames chosen
        # so sorted order reproduces the GT human_{i} identities
        labels = []
        tool_name = {"Patient": "Patient", "human_0": "staff_A", "human_1": "staff_B",
                     "human_2": "staff_C", "human_3": "staff_D"}
        for h_name, joints in joints_by_scan[pcd_idx].items():
            tool = coord_transform_or4d_to_pose_tool(np.array(joints, np.float64))
            for bp, (x, y, z) in zip(BODY_PARTS, tool):
                labels.append({"humanName": tool_name[h_name], "jointName": bp,
                               "point3d": {"location": {"x": float(x), "y": float(y), "z": float(z)}}})
        ann_dir = ROOT / f"export_holistic_take{take_idx}_processed" / "annotations"
        ann_dir.mkdir(parents=True, exist_ok=True)
        (ann_dir / f"{pcd_idx}.json").write_text(json.dumps({"labels": labels}))


def main():
    ROOT.mkdir(exist_ok=True)
    scans_by_split = {"train": [], "validation": []}
    joints_by_take: dict[int, dict] = {}

    def add(split, take_idx, pcd_idx, names, rels, humans, missing=()):
        objects = {str(i + 1): n for i, n in enumerate(sorted(names))}
        inv = {n: int(k) for k, n in objects.items()}
        rel_list = [[inv[s], inv[o], i, r] for i, (s, o, r) in enumerate(rels)]
        scans_by_split[split].append({
            "take_idx": take_idx,
            "scan": pcd_idx,
            "objects": objects,
            "relationships": rel_list,
            "human_idx_to_name": humans,
        })
        j = build_scan(take_idx, pcd_idx, objects, rel_list, humans, set(missing),
                       seed=take_idx * 7919 + int(pcd_idx))
        joints_by_take.setdefault(take_idx, {})[pcd_idx] = j

    # take 1 (train): two scans; 000001 exercises the emulated-cone path via
    # a secondary_table with no labeled points
    add("train", 1, "000000",
        ["Patient", "human_0", "operating_table", "anesthesia_equipment", "instrument", "instrument_table"],
        [("Patient", "operating_table", "LyingOn"), ("human_0", "Patient", "Assisting"),
         ("human_0", "instrument", "Holding")],
        {"human_0": "head-surgeon"})
    add("train", 1, "000001",
        ["Patient", "human_0", "human_1", "operating_table", "instrument", "secondary_table"],
        [("Patient", "operating_table", "LyingOn"), ("human_0", "Patient", "Drilling"),
         ("human_1", "secondary_table", "CloseTo")],
        {"human_0": "head-surgeon", "human_1": "circulating-nurse"},
        missing=["secondary_table"])
    # take 4 (val): one scan
    add("validation", 4, "000000",
        ["Patient", "human_0", "human_1", "operating_table", "instrument", "anesthesia_equipment"],
        [("Patient", "operating_table", "LyingOn"), ("human_1", "anesthesia_equipment", "CloseTo"),
         ("human_0", "Patient", "Touching")],
        {"human_0": "assistant-surgeon", "human_1": "anaesthetist"})

    for split, scans in scans_by_split.items():
        with open(ROOT / f"relationships_{split}.json", "w") as f:
            json.dump({"scans": scans}, f, indent=1)

    # L2 GT artifacts per take
    all_scans = [s for scans in scans_by_split.values() for s in scans]
    for take_idx in sorted({s["take_idx"] for s in all_scans}):
        take_scans = [s for s in all_scans if s["take_idx"] == take_idx]
        pcd_indices = [s["scan"] for s in take_scans]
        objects_per_scan = {s["scan"]: list(s["objects"].values()) for s in take_scans}
        write_l2_gt_artifacts(take_idx, pcd_indices, objects_per_scan, joints_by_take[take_idx])
        write_color_frames(take_idx, pcd_indices)
        write_cameras_and_2d(take_idx, pcd_indices, joints_by_take[take_idx])

    (ROOT / "human_name_to_3D_joints").mkdir(exist_ok=True)
    for take_idx, by_scan in joints_by_take.items():
        np.savez_compressed(ROOT / "human_name_to_3D_joints" / f"{take_idx}_GT_True.npz", by_scan)
    print(f"fixture written under {ROOT}")


if __name__ == "__main__":
    main()
