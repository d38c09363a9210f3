"""CLI — the whole pipeline behind one binary (the reference spreads this
over four conda envs and six entry scripts).

  python -m or4d_tpu.cli train    --config no_gt
  python -m or4d_tpu.cli evaluate --config no_gt --checkpoint-dir ckpts
  python -m or4d_tpu.cli infer    --config no_gt --checkpoint-dir ckpts \
      --split test  # writes scan_relations_{config}_{split}.json
  python -m or4d_tpu.cli roles    --relations scan_relations_*.json \
      --tracks tracks.pickle --output roles.json   # heuristic role prediction
  python -m or4d_tpu.cli phases   --relations scan_relations_*.json \
      --roles roles.json --output-dir phases_to_frames

Interchange formats are the reference contracts: scan_relations json
(main.py:111-115), role json (heuristic_based_role_prediction.py:392),
phase_to_frames json (recognize_surgery_phase.py:182-189).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import numpy as np

from or4d_tpu.config import load_config
from or4d_tpu.data.dataset import ORDataset
from or4d_tpu.data.vocab import DEFAULT_VOCAB
from or4d_tpu.train.loop import Trainer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="or4d_tpu", description=__doc__)
    p.add_argument(
        "mode",
        choices=[
            "train", "evaluate", "infer", "roles", "graphormer-roles",
            "phases", "phases-eval", "instance-labels", "visualize", "perception",
        ],
    )
    p.add_argument(
        "--task",
        default=None,
        choices=["pose2d-train", "pose2d-infer", "pose3d-train", "pose3d-infer",
                 "detect-train", "detect-infer"],
        help="perception mode: which L1 stage to run",
    )
    p.add_argument("--config", default="no_gt", help="builtin config name or JSON path")
    p.add_argument("--data-root", default="data")
    p.add_argument("--cache-dir", default=None, help="ORDataset sample cache dir (default: /tmp/or4d_cache)")
    p.add_argument("--strict-data", action="store_true",
                   help="fail instead of synthesizing geometry for scans whose raw files are missing")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument(
        "--torch-checkpoint", default=None,
        help="reference .pth state_dict (e.g. paper_model_no_gt_no_images.pth) "
             "to evaluate/infer with — the reference's paper_weight path "
             "(scene_graph_prediction/main.py:74-79); takes precedence over "
             "--checkpoint-dir",
    )
    p.add_argument("--split", default=None, help="infer/evaluate split (default: val for evaluate, test for infer)")
    p.add_argument("--serving", action="store_true",
                   help="evaluate: precompute per-batch SA1 geometry once and run the "
                        "serving fast path (or4d_tpu/serving.py; fixed eval sets). "
                        "train: run the per-epoch validation through the same cached "
                        "geometry (built once for the whole fit)")
    p.add_argument("--serving-cache-dir", default=None,
                   help="persist the serving geometry caches here (content-keyed "
                        "npz per batch) so serving restarts skip the precompute")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--limit", type=int, default=None, help="limit scans (smoke runs)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", default=None, help="output json path")
    # downstream stages
    p.add_argument("--relations", default=None, help="scan_relations json (roles/phases input)")
    p.add_argument("--tracks", default=None, help="tracks pickle ({take}_scene_graph_track_*.pickle format)")
    p.add_argument("--roles", default=None, help="role predictions json (phases input)")
    p.add_argument("--output-dir", default=None)
    p.add_argument("--from-gt", action="store_true", help="L2: GT objects (registered scans) + annotation-json humans")
    # phases-eval stage
    p.add_argument("--gt-dir", default=None, help="phases-eval: GT phase_to_frames_{take}.json dir")
    p.add_argument("--pred-dir", default=None, help="phases-eval: predicted *_phase_to_frames_{take}.json dir")
    p.add_argument("--pred-stem", default=None, help="phases-eval: prediction filename stem (default: any match)")
    # instance-labels stage
    p.add_argument("--boxes-dir", default=None, help="group_free_predictions npz dir")
    p.add_argument("--poses-dir", default=None, help="voxelpose pred_{take}_{frame}.npy dir")
    p.add_argument("--pcd-dir", default=None, help="fused point cloud dir ({take}_{scan}.pcd)")
    p.add_argument("--pred-pose2d", default=None, help="pose3d-train: pred_or_4d_hrnet_coco_*.npz from pose2d-infer")
    return p


def _load_scan_relations(path: str) -> dict[str, list]:
    raw = json.loads(Path(path).read_text())
    # reference keys may carry a _{split} suffix (get_take_rels strips it)
    out = {}
    for k, v in raw.items():
        parts = k.split("_")
        key = "_".join(parts[:2]) if len(parts) > 2 else k
        out[key] = [tuple(r) for r in v]
    return out


def run_roles(args) -> int:
    """Heuristic role prediction over predicted scene graphs
    (role_prediction/heuristic_based_role_prediction.py main path)."""
    import pickle

    from or4d_tpu.pipeline.roles_heuristic import predict_roles_for_take, write_role_json

    scan_relations = _load_scan_relations(args.relations)
    takes = sorted({int(k.split("_")[0]) for k in scan_relations})
    all_roles: dict[str, dict] = {}
    for take_idx in takes:
        frame_to_relations = {
            k.split("_", 1)[1]: v for k, v in scan_relations.items() if int(k.split("_")[0]) == take_idx
        }
        if args.tracks:
            tracks = pickle.loads(Path(args.tracks).read_bytes())
        else:
            # without tracking data, every human name becomes a one-name track
            # spanning the frames it appears in (degenerate but well-defined)
            names: dict[str, dict] = {}
            for frame, rels in frame_to_relations.items():
                for s, _r, o in rels:
                    for n in (s, o):
                        if "human" in n or n == "Patient":
                            names.setdefault(n, {"timestamp_to_human_pose": {}})[
                                "timestamp_to_human_pose"
                            ][frame] = (n, np.zeros((14, 3)))
            tracks = list(names.values())
        all_roles.update(predict_roles_for_take(take_idx, tracks, frame_to_relations))
    out = args.output or "rule_based_role_predictions.json"
    write_role_json(out, all_roles)
    print(f"wrote {out} ({len(all_roles)} frames)")
    return 0


def run_graphormer_roles(args) -> int:
    """Graphormer role prediction: train on tracks (real pickle or synthetic
    fixtures), score every track with temperature-4 softmax, assign roles
    greedily per frame, and write graphormer_based_role_predictions.json in
    the {"{take}_{scan}": {human_name: role}} interchange format
    (role_prediction_helpers.output_role_predictions :211-251) — the same
    contract the heuristic writer and the phases stage use. When GT scans are
    available a reference-style classification report is printed
    (eval_role_prediction_perf :142-208)."""
    import pickle

    import jax

    from or4d_tpu.data.dataset import load_relationship_scans
    from or4d_tpu.pipeline.role_dataset import build_tracks, make_synthetic_role_take
    from or4d_tpu.pipeline.roles_heuristic import (
        eval_role_prediction_perf,
        predict_roles_for_take,
        write_role_json,
    )
    from or4d_tpu.train.graphormer_trainer import GraphormerTrainer

    trainer = GraphormerTrainer()
    if args.tracks and args.relations:
        scan_relations = _load_scan_relations(args.relations)
        raw_tracks = pickle.loads(Path(args.tracks).read_bytes())
        takes = sorted({int(k.split("_")[0]) for k in scan_relations})
        take_idx = takes[0]
        frame_to_relations = {k.split("_", 1)[1]: v for k, v in scan_relations.items()}
        tracks = build_tracks(take_idx, raw_tracks, frame_to_relations, {})
        data = [(t.to_batch(frame_to_relations, max_graphs=8), t.role_label) for t in tracks]
        assign_tracks = raw_tracks
    else:
        print("no --tracks/--relations given: training on synthetic role-behavior tracks")
        take_idx = 1
        tracks, frame_to_relations, data = make_synthetic_role_take(take_idx)
        assign_tracks = [{"timestamp_to_human_pose": t.timestamp_to_human_pose} for t in tracks]
    state = trainer.init_state(jax.random.key(args.seed), data[0][0])
    # reference auto-resume (entry.py:105-107): a checkpoint dir with a saved
    # state means the model is trained — restore it and skip training, so a
    # second invocation reproduces the role json without retraining
    from or4d_tpu.train import checkpoint as g_ckpt

    restored = False
    if args.checkpoint_dir and g_ckpt.latest_step(args.checkpoint_dir) is not None:
        state = g_ckpt.restore(args.checkpoint_dir, state)
        print(f"restored graphormer checkpoint from {args.checkpoint_dir}; skipping training")
        restored = True
    if not restored:
        state, losses = trainer.fit(state, data, epochs=args.epochs or 3,
                                    checkpoint_dir=args.checkpoint_dir)
        print(f"trained on {len(data)} tracks: loss {losses[0]:.3f} -> {losses[-1]:.3f}")

    # scores keyed by RAW track index (unscored tracks fall back to the
    # reference's default guess inside the assignment)
    scores = {t.track_idx: trainer.score_track(state, b) for t, (b, _l) in zip(tracks, data)}
    predictions = predict_roles_for_take(take_idx, assign_tracks, frame_to_relations, scores)
    out = args.output or "graphormer_based_role_predictions.json"
    write_role_json(out, predictions)
    print(f"wrote {out} ({len(predictions)} frames)")

    for split in ("train", "val", "test"):
        gt_scans = [s for s in load_relationship_scans(args.data_root, split) if s["take_idx"] == take_idx]
        if gt_scans:
            _, overall = eval_role_prediction_perf({take_idx: gt_scans}, predictions)
            if overall is not None:
                print(f"role eval vs GT ({split}): macro F1 {overall.macro_f1:.3f}")
            break
    return 0


def run_instance_labels(args) -> int:
    """L2: project object poses + 3D human poses onto the fused clouds
    (compute_instance_labels). Two modes:

    * dataset mode (default when --data-root has export_holistic_take*
      dirs): per-take driver writing instance_labels{,_pred}/{take}_{scan}.npz
      and human_name_to_3D_joints/{take}_GT_{bool}.npz; --from-gt uses
      registered object scans + annotation-json humans (:139-156, :205-230),
      otherwise Group-Free boxes + VoxelPose poses;
    * loose-directory mode (--pcd-dir): label each pcd from npz boxes/poses.
    """
    from or4d_tpu.data.pcd_io import read_pcd
    from or4d_tpu.pipeline.instance_labels import compute_instance_labels_for_scan, process_take
    from or4d_tpu.pipeline.perception_infer import load_boxes_npz

    data_root = Path(args.data_root)
    takes = sorted(
        int(p.name.replace("export_holistic_take", "").replace("_processed", ""))
        for p in data_root.glob("export_holistic_take*_processed")
    )
    if takes and not args.pcd_dir:
        out_root = Path(args.output_dir) if args.output_dir else data_root
        total = 0
        for take_idx in takes:
            n = process_take(data_root, take_idx, from_gt=args.from_gt, out_root=out_root,
                             boxes_dir=args.boxes_dir, poses_dir=args.poses_dir)
            print(f"take {take_idx}: {n} scans labeled (from_gt={args.from_gt})")
            total += n
        print(f"wrote {total} instance-label npz files under {out_root}")
        return 0

    pcd_dir = Path(args.pcd_dir or ".")
    outdir = Path(args.output_dir)
    outdir.mkdir(parents=True, exist_ok=True)
    count = 0
    for pcd_path in sorted(pcd_dir.glob("*.pcd")):
        scan_id = pcd_path.stem
        points = read_pcd(pcd_path)[:, :3]
        boxes = None
        if args.boxes_dir and (Path(args.boxes_dir) / f"{scan_id}.npz").exists():
            loaded = load_boxes_npz(Path(args.boxes_dir) / f"{scan_id}.npz")
            boxes = {"classes": loaded["classes_nms"], "bboxes": loaded["bboxes_nms"], "scores": loaded["scores_nms"]}
        human_poses = {}
        if args.poses_dir:
            take_idx, frame = scan_id.split("_")
            p = Path(args.poses_dir) / f"pred_{take_idx}_{frame}.npy"
            if p.exists():
                for h_idx, pose in enumerate(np.load(p)):
                    human_poses[f"human_{h_idx}"] = pose
        labels = compute_instance_labels_for_scan(points, boxes=boxes, human_poses=human_poses)
        np.savez_compressed(outdir / f"{scan_id}.npz", labels)
        count += 1
    print(f"wrote {count} instance-label npz files to {outdir}")
    return 0


def run_visualize(args) -> int:
    """L5: render predicted scene graphs to HTML (the reference's pyvis
    visualize_scene_graph_predictions.py) and, when instance-label npz +
    pcd dirs are given, labeled clouds to PNG (visualize_instance_labels.py)."""
    from or4d_tpu.utils.visualize import instance_labels_to_png, scene_graph_to_html

    outdir = Path(args.output_dir)
    outdir.mkdir(parents=True, exist_ok=True)
    count = 0
    if args.relations:
        scan_relations = _load_scan_relations(args.relations)
        nonempty = [(k, v) for k, v in sorted(scan_relations.items()) if v]
        for scan_id, rels in nonempty[: args.limit or 20]:
            scene_graph_to_html(rels, outdir / f"sg_{scan_id}.html", title=f"scene graph {scan_id}")
            count += 1
    if args.pcd_dir and args.boxes_dir:
        from or4d_tpu.data.pcd_io import read_pcd

        for pcd_path in sorted(Path(args.pcd_dir).glob("*.pcd"))[: args.limit or 5]:
            lab_path = Path(args.boxes_dir) / f"{pcd_path.stem}.npz"
            if not lab_path.exists():
                continue
            pts = read_pcd(pcd_path)
            labels = np.load(lab_path)["arr_0"]
            instance_labels_to_png(pts[:, :3], labels, outdir / f"labels_{pcd_path.stem}.png", title=pcd_path.stem)
            count += 1
    print(f"wrote {count} visualizations to {outdir}")
    return 0


def run_phases(args) -> int:
    """Surgery-phase recognition over predicted scene graphs + roles
    (surgery_phase_recognition/recognize_surgery_phase.py)."""
    from or4d_tpu.pipeline.phases import recognize_phases, write_phase_json

    scan_relations = _load_scan_relations(args.relations)
    role_predictions = json.loads(Path(args.roles).read_text()) if args.roles else {}
    takes = sorted({int(k.split("_")[0]) for k in scan_relations})
    outdir = Path(args.output_dir or "phases_to_frames")
    outdir.mkdir(parents=True, exist_ok=True)
    stem = Path(args.relations).stem
    for take_idx in takes:
        take_sgs = {k: v for k, v in scan_relations.items() if int(k.split("_")[0]) == take_idx}
        phases = recognize_phases(take_sgs, role_predictions)
        out = outdir / f"{stem}_phase_to_frames_{take_idx}.json"
        write_phase_json(out, phases)
        print(f"take {take_idx}: {list(phases)} -> {out}")
    return 0


def run_phases_eval(args) -> int:
    """Phase-recognition evaluation: per-take and per-split classification
    reports of predicted vs GT phase ranges (the reference's
    evaluate_surgery_phase_recognition.py:11-49 printout)."""
    from or4d_tpu.config import TAKE_SPLIT
    from or4d_tpu.pipeline.phases import evaluate_phase_dirs

    gt_dir = args.gt_dir or "phases_to_frames"
    pred_dir = args.pred_dir or args.output_dir or "phases_to_frames"
    reports = evaluate_phase_dirs(gt_dir, pred_dir, pred_stem=args.pred_stem)
    if not reports:
        print(f"no (GT, prediction) phase-json pairs found under {gt_dir} / {pred_dir}")
        return 1
    for split in ("train", "val", "test"):
        for take_idx in TAKE_SPLIT[split]:
            key = f"take_{take_idx}"
            if key in reports:
                print(f"\nTake {take_idx}\n\n{reports[key].to_text()}")
        if split in reports:
            print(f"\n{split}\n\n{reports[split].to_text()}")
    return 0


def run_perception(args) -> int:
    """L1 training/inference drivers, one per external_src pipeline:
    pose2d (HigherHRNet tools/dist_train equivalent), pose2d-infer (the
    `pred_or_4d_hrnet_coco_{split}.npz` dump VoxelPose consumes), pose3d
    (voxelpose run/train), detect (Group-Free train_OR.py)."""
    import jax as _jax

    from or4d_tpu.train import checkpoint as ckpt

    epochs = args.epochs or 1
    split = args.split or "train"
    rng = _jax.random.key(args.seed)

    if args.task in ("pose2d-train", "pose2d-infer"):
        from or4d_tpu.data.higherhrnet_dataset import HigherHRNetDataset
        from or4d_tpu.train.perception_trainers import HigherHRNetTrainer

        tr = HigherHRNetTrainer()
        ds = HigherHRNetDataset(args.data_root, split, augment=args.task == "pose2d-train")
        first = next(ds.batches(args.batch_size or 2))
        state = tr.init_state(rng, first["images"])
        if args.checkpoint_dir and ckpt.latest_step(args.checkpoint_dir) is not None:
            state = ckpt.restore(args.checkpoint_dir, state)
        if args.task == "pose2d-infer":
            from or4d_tpu.pipeline.perception_infer import run_2d_inference_for_voxelpose

            out = args.output or f"pred_or_4d_hrnet_coco_{split}.npz"
            preds = run_2d_inference_for_voxelpose(tr.model, {"params": state["params"], "batch_stats": state["batch_stats"]}, ds, out)
            print(f"wrote {out} ({len(preds)} images)")
            return 0
        for epoch in range(epochs):
            losses = []
            for i, b in enumerate(ds.batches(args.batch_size or 2, shuffle=True, seed=args.seed + epoch, limit=args.limit)):
                state, loss, _ex = tr.train_step(state, b["images"], b["gt_low"], b["gt_high"], b["joint_pos"], b["joint_valid"])
                losses.append(float(loss))
            print(f"pose2d epoch {epoch}: loss={np.mean(losses):.4f} ({len(losses)} steps)")
            if args.checkpoint_dir:
                ckpt.save(args.checkpoint_dir, state, step=epoch)
        return 0

    if args.task == "pose3d-infer":
        from or4d_tpu.data.voxelpose_dataset import VoxelPoseDataset
        from or4d_tpu.pipeline.perception_infer import run_3d_pose_inference_for_take
        from or4d_tpu.train.perception_trainers import VoxelPoseTrainer

        ds = VoxelPoseDataset(args.data_root, split, pred_pose2d_path=args.pred_pose2d, inference=True)
        tr = VoxelPoseTrainer()
        import jax.numpy as jnp

        cameras = {k: jnp.asarray(v) for k, v in ds.cameras.items()}
        hs = jnp.asarray(ds.heatmap_scale)
        state = tr.init_state(rng, jnp.asarray(ds.sample(0)["input_heatmaps"]), cameras, hs)
        if args.checkpoint_dir and ckpt.latest_step(args.checkpoint_dir) is not None:
            state = ckpt.restore(args.checkpoint_dir, state)
        variables = {"params": state["params"], "batch_stats": state["batch_stats"]}
        out_dir = Path(args.output_dir or (Path(args.data_root) / "OR_4D_outputs"))
        total = 0
        for take_idx in sorted({rec["take_idx"] for rec in ds.db}):
            n = run_3d_pose_inference_for_take(tr.model, variables, ds, take_idx, out_dir)
            print(f"take {take_idx}: {n} pred_*.npy frames -> {out_dir}")
            total += n
        print(f"wrote {total} pose files")
        return 0

    if args.task == "detect-infer":
        from or4d_tpu.data.groupfree_dataset import GroupFreeDetectionDataset
        from or4d_tpu.pipeline.perception_infer import run_detection_inference
        from or4d_tpu.train.perception_trainers import GroupFreeTrainer

        import jax.numpy as jnp

        ds = GroupFreeDetectionDataset(args.data_root, split)
        tr = GroupFreeTrainer()
        b0 = ds.batch([0])
        msa = ds.mean_size_arr()
        state = tr.init_state(rng, jnp.asarray(b0["point_clouds"]), jnp.asarray(msa))
        if args.checkpoint_dir and ckpt.latest_step(args.checkpoint_dir) is not None:
            state = ckpt.restore(args.checkpoint_dir, state)
        variables = {"params": state["params"], "batch_stats": state["batch_stats"]}
        out_dir = Path(args.output_dir or (Path(args.data_root) / "group_free_predictions"))
        n = run_detection_inference(tr.model, variables, ds, out_dir)
        print(f"wrote {n} box npz files -> {out_dir}")
        return 0

    if args.task == "pose3d-train":
        from or4d_tpu.data.voxelpose_dataset import VoxelPoseDataset
        from or4d_tpu.train.perception_trainers import VoxelPoseTrainer

        ds = VoxelPoseDataset(args.data_root, split, pred_pose2d_path=args.pred_pose2d)
        tr = VoxelPoseTrainer()
        s0 = ds.sample(0)
        import jax.numpy as jnp

        cameras = {k: jnp.asarray(v) for k, v in ds.cameras.items()}
        hs = jnp.asarray(ds.heatmap_scale)
        state = tr.init_state(rng, jnp.asarray(s0["input_heatmaps"]), cameras, hs)
        if args.checkpoint_dir and ckpt.latest_step(args.checkpoint_dir) is not None:
            state = ckpt.restore(args.checkpoint_dir, state)
        for epoch in range(epochs):
            losses = []
            n = min(len(ds), args.limit) if args.limit else len(ds)
            for i in range(n):
                state, loss, _ex = tr.train_step_from_sample(state, ds.sample(i), cameras, hs)
                losses.append(float(loss))
            print(f"pose3d epoch {epoch}: loss={np.mean(losses):.4f} ({len(losses)} frames)")
            if args.checkpoint_dir:
                ckpt.save(args.checkpoint_dir, state, step=epoch)
        return 0

    if args.task == "detect-train":
        from or4d_tpu.data.groupfree_dataset import GroupFreeDetectionDataset
        from or4d_tpu.train.perception_trainers import GroupFreeTrainer

        ds = GroupFreeDetectionDataset(args.data_root, split)
        tr = GroupFreeTrainer()
        b0 = ds.batch(list(range(min(2, len(ds)))))
        msa = ds.mean_size_arr()
        import jax.numpy as jnp

        state = tr.init_state(rng, jnp.asarray(b0["point_clouds"]), jnp.asarray(msa))
        if args.checkpoint_dir and ckpt.latest_step(args.checkpoint_dir) is not None:
            state = ckpt.restore(args.checkpoint_dir, state)
        bs = args.batch_size or 2
        order = np.arange(len(ds))
        for epoch in range(epochs):
            np.random.default_rng(args.seed + epoch).shuffle(order)
            sel = order[: args.limit] if args.limit else order
            losses = []
            for i in range(0, len(sel), bs):
                rng, key = _jax.random.split(rng)
                b = ds.batch([int(j) for j in sel[i : i + bs]])
                state, loss, _parts = tr.train_step_from_batch(state, b, msa, key)
                losses.append(float(loss))
            print(f"detect epoch {epoch}: loss={np.mean(losses):.4f} ({len(losses)} steps)")
            if args.checkpoint_dir:
                ckpt.save(args.checkpoint_dir, state, step=epoch)
        return 0

    raise SystemExit("perception mode requires --task")


def main(argv: list[str] | None = None) -> int:
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", "/tmp/or4d_jax_cache_tpu")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    args = build_parser().parse_args(argv)
    if args.mode == "roles":
        return run_roles(args)
    if args.mode == "graphormer-roles":
        return run_graphormer_roles(args)
    if args.mode == "phases":
        return run_phases(args)
    if args.mode == "phases-eval":
        return run_phases_eval(args)
    if args.mode == "instance-labels":
        return run_instance_labels(args)
    if args.mode == "visualize":
        return run_visualize(args)
    if args.mode == "perception":
        return run_perception(args)
    cfg = load_config(args.config)
    # vocab from data files when shipped, embedded defaults otherwise
    from pathlib import Path as _P

    from or4d_tpu.data.vocab import Vocab

    vocab = (
        Vocab.from_files(args.data_root)
        if (_P(args.data_root) / "classes.txt").exists()
        else DEFAULT_VOCAB
    )
    print(f"devices: {jax.devices()}")

    ds_kw = dict(data_root=args.data_root, cache_dir=args.cache_dir,
                 synthetic_fallback=not args.strict_data)
    train_ds = ORDataset(cfg, "train", vocab, **ds_kw)
    w_obj, w_rel = train_ds.weights()
    trainer = Trainer(cfg, vocab, w_obj, w_rel)
    batch_size = args.batch_size or cfg.tpu.scene_batch

    def init_or_restore():
        sample = next(train_ds.batches(batch_size))
        state = trainer.init_state(jax.random.key(args.seed), sample)
        restored = False
        if args.torch_checkpoint:
            # paper-weight path (reference main.py:74-79: raw load_state_dict
            # of paper_model_no_gt_no_images.pth); also accepts a Lightning
            # .ckpt dict wrapping the state_dict
            import torch

            from or4d_tpu.utils.torch_import import import_sgpn_state_dict

            sd = torch.load(args.torch_checkpoint, map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            variables = {
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
            }
            imported = import_sgpn_state_dict(sd, variables)
            state = state.replace(
                params=imported["params"],
                batch_stats=imported.get("batch_stats", state.batch_stats),
            )
            print(f"imported reference torch checkpoint {args.torch_checkpoint}")
            restored = True
        elif args.checkpoint_dir:
            from or4d_tpu.train import checkpoint as ckpt

            step = ckpt.latest_step(args.checkpoint_dir)
            if step is not None:
                print(f"restoring checkpoint step {step} from {args.checkpoint_dir}")
                state = ckpt.restore(args.checkpoint_dir, state)
                restored = True
        if not restored and args.mode in ("evaluate", "infer"):
            where = args.checkpoint_dir or "(no --checkpoint-dir given)"
            print(f"WARNING: no checkpoint found under {where}; "
                  f"{args.mode} will run from RANDOM INITIALIZATION")
        return state

    if args.mode == "train":
        # val batches only feed eval_step -> pair-shared crops (paired path);
        # with --serving the per-epoch validation instead goes through a
        # ServingEvaluator built once (unpaired SA1 geometry cached)
        val_ds = ORDataset(cfg, "val", vocab, pair_shared=not args.serving, **ds_kw)
        state = init_or_restore()
        state, history = trainer.fit(
            state,
            train_batches=list(train_ds.batches(batch_size, shuffle=True, seed=args.seed, limit=args.limit)),
            val_batches=list(val_ds.batches(batch_size, limit=args.limit)),
            epochs=args.epochs,
            checkpoint_dir=args.checkpoint_dir,
            serving_val=args.serving,
        )
        print(json.dumps(history[-1]))
    elif args.mode == "evaluate":
        split = args.split or "val"
        # pair_shared: eval crops are direction-invariant by construction, so
        # eval_step's paired rel-encoder path fires (one encode per pair).
        # Serving mode instead precomputes SA1 geometry (unpaired crops).
        eval_ds = ORDataset(cfg, split, vocab, pair_shared=not args.serving, **ds_kw)
        state = init_or_restore()
        if args.serving:
            from or4d_tpu.serving import ServingEvaluator

            ev = ServingEvaluator(trainer, eval_ds.batches(batch_size, limit=args.limit),
                                  cache_dir=args.serving_cache_dir)
            f1 = ev.evaluate(state, verbose=True)
        else:
            # verbose=True: per-take classification reports, the reference's
            # evaluate_predictions output
            f1 = trainer.evaluate(state, eval_ds.batches(batch_size, limit=args.limit), verbose=True)
        print(json.dumps({"split": split, "relation_macro_f1": f1}))
    else:  # infer
        split = args.split or "test"
        eval_ds = ORDataset(cfg, split, vocab, for_eval=True, **ds_kw)
        state = init_or_restore()
        scan_relations = trainer.predict_relations(state, eval_ds.batches(batch_size, limit=args.limit))
        out = args.output or f"scan_relations_{cfg.name}_{split}.json"
        Path(out).write_text(json.dumps(scan_relations))
        print(f"wrote {out} ({len(scan_relations)} scans)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
