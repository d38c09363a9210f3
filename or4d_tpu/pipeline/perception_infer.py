"""L1 inference drivers — produce the reference interchange artifacts.

Reference artifact contract (SURVEY.md §1 L1 row):
  * HigherHRNet 2D poses -> `pred_or_4d_hrnet_coco_{split}.npz`
    (tools/calculate_2d_human_pose.py:94-207): {"{take}_{frame}_{cam}": (P, J, 3)}
  * VoxelPose 3D poses  -> `pred_{take}_{frame}.npy`
    (get_human_poses_4D_OR.py:103-109): (num_people, 14, 3) world mm
  * Group-Free boxes    -> `group_free_predictions/{take}_{scan}.npz`
    (ap_helper.py:263-322): dict with classes_nms, bboxes_nms (K, 7),
    scores_nms

These drivers batch scans through the jitted models and write exactly those
formats so the downstream stages (compute_instance_labels, scene-graph
training without GT) consume them unchanged.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def write_2d_pose_npz(path: str | Path, per_frame_people: dict[str, np.ndarray]) -> None:
    """{"{take}_camera0{c}_colorimage-{idx}.jpg": (P, J, 3) [x, y, score]}
    -> the reference HRNet dump format: ONE pickled dict under 'arr_0'
    (voxelpose OR_4D.py:113-115 reads np.load(...)['arr_0'].item())."""
    np.savez_compressed(path, np.array({k: np.asarray(v) for k, v in per_frame_people.items()}, dtype=object))


def run_2d_inference_for_voxelpose(model, variables, dataset, out_path: str | Path, max_people: int = 10) -> dict:
    """Enumerate a HigherHRNetDataset's images (no augmentation), run
    HigherHRNet + the HeatmapParser, and dump the npz VoxelPose's db builder
    consumes (`pred_or_4d_hrnet_coco_{split}.npz`), keyed by the reference
    identifier '{take}_{image_name}'. Images stream one at a time — a full
    take is thousands of 512^2 frames, far too much to stage at once. The
    next frame's load + forward is dispatched before the current frame's
    host-side grouping (utils/stream.py lookahead), so the device computes
    while Munkres matching runs on host."""
    import jax
    import jax.numpy as jnp

    from or4d_tpu.utils.stream import lookahead

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    preds: dict[str, np.ndarray] = {}

    def dispatch(i_d):
        i, d = i_d
        sample = dataset.sample(i)
        key = f"{d['take_idx']}_{d['image_path'].name}"
        return key, fwd(variables, jnp.asarray(sample["image"][None]))

    def consume(pair):
        key, (low, high) = pair
        preds[key] = _group_2d_people(low, high, max_people)

    lookahead(enumerate(dataset.image_dicts), dispatch, consume)
    write_2d_pose_npz(out_path, preds)
    return preds


def _group_2d_people(low, high, max_people: int) -> np.ndarray:
    """Host-side post-processing of one HigherHRNet forward: heatmap
    aggregation + the reference HeatmapParser grouping (Munkres matching +
    adjust + refine, core/group.py). ``low``/``high`` are the (1, ...) model
    outputs (device or host)."""
    import jax
    import jax.numpy as jnp

    from or4d_tpu.models.higherhrnet import aggregate_heatmaps
    from or4d_tpu.pipeline.ae_grouping import parse_heatmaps

    low = np.asarray(low[0])
    high = np.asarray(high[0])
    J = high.shape[-1]
    agg = aggregate_heatmaps(low, high)
    tags = np.asarray(
        jax.image.resize(jnp.asarray(low[..., J:]), high.shape[:-1] + (J,), "bilinear")
    )
    # parser eats channels-first (J, H, W)
    people, _scores = parse_heatmaps(
        agg.transpose(2, 0, 1), tags.transpose(2, 0, 1), max_people=max_people
    )
    return people[..., :3] if len(people) else np.zeros((0, J, 3))


def infer_2d_poses(model, variables, images_by_key: dict[str, np.ndarray], max_people: int = 10, fwd=None) -> dict[str, np.ndarray]:
    """Run HigherHRNet per camera image; group with the reference
    HeatmapParser. Pass a pre-jitted ``fwd`` when calling repeatedly — a
    fresh lambda per call would retrace every image."""
    import jax
    import jax.numpy as jnp

    if fwd is None:
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    out = {}
    for key, img in images_by_key.items():
        low, high = fwd(variables, jnp.asarray(img[None]))
        out[key] = _group_2d_people(low, high, max_people)
    return out


def infer_3d_poses(model, variables, heatmaps: np.ndarray, cameras: dict, heatmap_scale, out_path: str | Path, threshold: float = 0.1, fwd=None) -> np.ndarray:
    """VoxelPose forward -> (P, 14, 3) world poses; writes pred_*.npy.
    Pass a pre-jitted ``fwd(variables, heatmaps)`` when calling per frame —
    a fresh lambda per call would retrace every frame."""
    import jax
    import jax.numpy as jnp

    if fwd is None:
        fwd = jax.jit(lambda v, h: model.apply(v, h, cameras, jnp.asarray(heatmap_scale), train=False))
    poses, scores, _centers, _root = fwd(variables, jnp.asarray(heatmaps))
    poses = np.asarray(poses)
    scores = np.asarray(scores)
    keep = scores > threshold
    result = poses[keep]
    np.save(out_path, result)
    return result


def run_3d_pose_inference_for_take(model, variables, dataset, take_idx: int, out_dir: str | Path, threshold: float = 0.1) -> int:
    """Per-take VoxelPose inference driver (get_human_poses_4D_OR.py:41-112):
    enumerate the take's frames, run the jitted forward (hoisted once — TPU
    compiles are expensive), and dump `pred_{take}_{frame}.npy` per frame
    with at least one confident person; empty frames are skipped exactly like
    the reference (`if len(pred) == 0: continue`, :106-107). Returns the
    number of files written."""
    import jax
    import jax.numpy as jnp

    from or4d_tpu.utils.stream import lookahead

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    cameras = {k: jnp.asarray(v) for k, v in dataset.cameras.items()}
    hs = jnp.asarray(dataset.heatmap_scale)
    fwd = jax.jit(lambda v, h: model.apply(v, h, cameras, hs, train=False))

    def dispatch(i_rec):
        i, rec = i_rec
        sample = dataset.sample(i)
        poses, scores, _c, _r = fwd(variables, jnp.asarray(sample["input_heatmaps"]))
        return rec, poses, scores

    def consume(item):
        rec, poses, scores = item
        keep = np.asarray(scores) > threshold
        result = np.asarray(poses)[keep]
        if len(result) == 0:
            return 0
        np.save(out_dir / f"pred_{take_idx}_{rec['pcd_idx']}.npy", result)
        return 1

    # next frame's load + forward dispatched before the current frame's pull
    # (utils/stream.py lookahead) — the device never idles on npy writes
    frames = [(i, rec) for i, rec in enumerate(dataset.db) if rec["take_idx"] == take_idx]
    return sum(lookahead(frames, dispatch, consume))


def infer_boxes(model, variables, point_cloud: np.ndarray, mean_size_arr: np.ndarray, out_path: str | Path, nms_iou: float = 0.25, score_threshold: float = 0.05, fwd=None) -> dict:
    """Group-Free forward -> boxes npz in the reference dict format
    (ap_helper.dump_predictions :263-322): both the confidence-filtered set
    (bboxes/scores/classes) and the additionally-NMS'd set (*_nms keys —
    what compute_instance_labels consumes). Pass a pre-jitted ``fwd`` when
    calling per scan."""
    import jax
    import jax.numpy as jnp

    if fwd is None:
        fwd = jax.jit(lambda v, pc: model.apply(v, pc, jnp.asarray(mean_size_arr), train=False))
    out = fwd(variables, jnp.asarray(point_cloud[None]))
    return _finish_boxes(out, mean_size_arr, out_path, nms_iou, score_threshold)


def _finish_boxes(out, mean_size_arr, out_path, nms_iou: float, score_threshold: float) -> dict:
    """Host-side tail of one Group-Free forward: decode, confidence filter,
    same-class NMS, write the reference npz dict."""
    from or4d_tpu.models.groupfree import decode_boxes, nms_3d_samecls

    center, size, heading, cls, score = decode_boxes(out["last"], mean_size_arr)
    center, size, heading, cls, score = map(lambda x: np.asarray(x)[0], (center, size, heading, cls, score))
    ok = score > score_threshold
    center, size, heading, cls, score = center[ok], size[ok], heading[ok], cls[ok], score[ok]
    boxes7_all = np.concatenate([center, size, heading[:, None]], axis=1)
    keep = nms_3d_samecls(center, size, score, headings=heading, classes=cls, iou_threshold=nms_iou)
    boxes7 = np.concatenate([center[keep], size[keep], heading[keep, None]], axis=1)
    result = {
        "bboxes": boxes7_all, "scores": score, "classes": cls,
        "classes_nms": cls[keep], "bboxes_nms": boxes7, "scores_nms": score[keep],
    }
    np.savez_compressed(out_path, result)
    return result


def run_detection_inference(model, variables, dataset, out_dir: str | Path, nms_iou: float = 0.25, score_threshold: float = 0.05) -> int:
    """Per-split Group-Free inference driver (infer.py:153-226): enumerate
    the dataset's scans, run the jitted forward once per scan (hoisted), and
    write `group_free_predictions/{take}_{scan}.npz` per scan. The next
    scan's load + forward is dispatched before the current scan's
    decode/NMS/write (utils/stream.py lookahead). Returns the number of
    files written."""
    import jax
    import jax.numpy as jnp

    from or4d_tpu.utils.stream import lookahead

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    msa = np.asarray(dataset.mean_size_arr())
    fwd = jax.jit(lambda v, pc: model.apply(v, pc, jnp.asarray(msa), train=False))

    def dispatch(i):
        ret = dataset[i]
        pc = jnp.asarray(np.asarray(ret["point_clouds"], np.float32)[None])
        return ret["scan_name"], fwd(variables, pc)

    def consume(pair):
        name, out = pair
        _finish_boxes(out, msa, out_dir / f"{name}.npz", nms_iou, score_threshold)
        return 1

    return sum(lookahead(range(len(dataset)), dispatch, consume))


def load_boxes_npz(path: str | Path) -> dict:
    """Read the group_free_predictions npz (compute_instance_labels.py:159)."""
    return np.load(path, allow_pickle=True)["arr_0"].item()
