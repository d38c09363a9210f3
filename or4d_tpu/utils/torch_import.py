"""Paper-weight import: reference torch state_dict -> or4d_tpu variables.

The reference ships paper checkpoints (`paper_model_no_gt_no_images.pth`,
loaded via raw load_state_dict at scene_graph_prediction/main.py:74-79); this
module maps that state_dict layout onto the flax parameter tree so paper
results can be replicated for parity testing (SURVEY.md §5 checkpoint notes).

Layout mapping (reference -> ours):
  obj_encoder.backbone.SA_modules.{s}.mlps.{k}.{3*l}.weight   Conv2d (O,I,1,1)
      -> obj_encoder/sa{s+1}/mlp_{k}/dense_{l}/kernel (I,O)
  ...SA_modules.{s}.mlps.{k}.{3*l+1}.*                        BatchNorm2d
      -> .../bn_{l}/{scale,bias} + batch_stats mean/var
  SA_modules.2 (global)  -> sa3/mlp/...
  gcn.gconvs.{i}.nn1.{0,3}. / nn2.{0,3}.                      Linear
      -> gcn/layer_{i}/nn1/dense_{0,1}, nn2/dense_{0,1} (transposed)
  gcn.gconvs.{i}.nn1.{1,4}. / nn2.{1}.                        BatchNorm1d
      -> .../bn_{j} (track_running_stats=False -> params only)
  obj_predictor.fc{1,2,3} / rel_predictor.fc{1,2,3}           Linear
      -> obj_predictor|rel_predictor/fc{1,2,3}/{kernel,bias}
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _to_np(v) -> np.ndarray:
    try:
        import torch

        if isinstance(v, torch.Tensor):
            return v.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(v)


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node[p]
    expected = np.asarray(node[path[-1]])
    if expected.shape != value.shape:
        raise ValueError(f"shape mismatch at {'/'.join(path)}: checkpoint {value.shape} vs model {expected.shape}")
    node[path[-1]] = value.astype(expected.dtype)


def import_sgpn_state_dict(state_dict: dict[str, Any], variables: dict) -> dict:
    """Map a reference SGPNModelWrapper state_dict onto initialized flax
    ``variables`` ({'params': ..., 'batch_stats': ...}). Returns new
    variables; raises on any shape mismatch. Unknown reference keys are
    collected and reported."""
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {}))
    unused = []

    def map_linear(src: str, dst: tuple[str, ...]):
        w = _to_np(state_dict[f"{src}.weight"])
        _set(params, dst + ("kernel",), w.T if w.ndim == 2 else w.reshape(w.shape[0], -1).T)
        if f"{src}.bias" in state_dict:
            _set(params, dst + ("bias",), _to_np(state_dict[f"{src}.bias"]))

    def map_conv1x1(src: str, dst: tuple[str, ...]):
        w = _to_np(state_dict[f"{src}.weight"])  # (O, I, 1, 1)
        _set(params, dst + ("kernel",), w[:, :, 0, 0].T)
        if f"{src}.bias" in state_dict:
            _set(params, dst + ("bias",), _to_np(state_dict[f"{src}.bias"]))

    def map_bn(src: str, dst: tuple[str, ...], running: bool):
        _set(params, dst + ("scale",), _to_np(state_dict[f"{src}.weight"]))
        _set(params, dst + ("bias",), _to_np(state_dict[f"{src}.bias"]))
        if running and f"{src}.running_mean" in state_dict:
            _set(stats, dst + ("mean",), _to_np(state_dict[f"{src}.running_mean"]))
            _set(stats, dst + ("var",), _to_np(state_dict[f"{src}.running_var"]))

    handled = set()

    for enc in ("obj_encoder", "rel_encoder"):
        for s in range(3):
            prefix = f"{enc}.backbone.SA_modules.{s}"
            scales = [0, 1] if s < 2 else [0]
            for k in scales:
                mdst = (enc, f"sa{s+1}") + ((f"mlp_{k}",) if s < 2 else ("mlp",))
                l = 0
                while f"{prefix}.mlps.{k}.{3*l}.weight" in state_dict:
                    map_conv1x1(f"{prefix}.mlps.{k}.{3*l}", mdst + (f"dense_{l}",))
                    map_bn(f"{prefix}.mlps.{k}.{3*l+1}", mdst + (f"bn_{l}",), running=True)
                    handled.update(
                        f"{prefix}.mlps.{k}.{3*l+i}.{suf}"
                        for i in (0, 1)
                        for suf in ("weight", "bias", "running_mean", "running_var", "num_batches_tracked")
                    )
                    l += 1

    # GCN: build_mlp layer indices — nn1 (on_last): Linear(0) BN(1) ReLU
    # Linear(3) BN(4); nn2: Linear(0) BN(1) ReLU Linear(3)
    i = 0
    while f"gcn.gconvs.{i}.nn1.0.weight" in state_dict:
        base = f"gcn.gconvs.{i}"
        dst = ("gcn", f"layer_{i}")
        map_linear(f"{base}.nn1.0", dst + ("nn1", "dense_0"))
        map_bn(f"{base}.nn1.1", dst + ("nn1", "bn_0"), running=False)
        map_linear(f"{base}.nn1.3", dst + ("nn1", "dense_1"))
        map_bn(f"{base}.nn1.4", dst + ("nn1", "bn_1"), running=False)
        map_linear(f"{base}.nn2.0", dst + ("nn2", "dense_0"))
        map_bn(f"{base}.nn2.1", dst + ("nn2", "bn_0"), running=False)
        map_linear(f"{base}.nn2.3", dst + ("nn2", "dense_1"))
        for key in list(state_dict):
            if key.startswith(base + "."):
                handled.add(key)
        i += 1

    for head, dst_head in (("obj_predictor", "obj_predictor"), ("rel_predictor", "rel_predictor")):
        for fc in ("fc1", "fc2", "fc3"):
            if f"{head}.{fc}.weight" in state_dict:
                map_linear(f"{head}.{fc}", (dst_head, fc))
                handled.update({f"{head}.{fc}.weight", f"{head}.{fc}.bias"})

    # Image branch (the with-images paper checkpoint,
    # scene_graph_prediction_model.py:49-57,98-102): `full_image_model.*` is
    # the timm tf_efficientnet_b5_ns trunk (retrained conv_head included) and
    # `full_image_feature_reduction.*` the per-camera 2048 -> emb//6 Linear.
    has_image_keys = any(k.startswith("full_image_model.") for k in state_dict)
    if has_image_keys and "image_branch" in params:
        from or4d_tpu.models.efficientnet import timm_parameter_mapping

        for timm_key, collection, path, kind in timm_parameter_mapping():
            src = f"full_image_model.{timm_key}"
            if src not in state_dict:
                raise KeyError(f"with-images checkpoint missing {src}")
            a = _to_np(state_dict[src])
            if kind == "conv":
                a = a.transpose(2, 3, 1, 0)  # OIHW -> HWIO (depthwise incl.)
            _set(params if collection == "params" else stats, ("image_branch",) + path, a)
            handled.add(src)
        handled.update(
            k for k in state_dict
            if k.startswith("full_image_model.") and k.endswith("num_batches_tracked")
        )
        map_linear("full_image_feature_reduction", ("image_branch", "reduction"))
        handled.update({"full_image_feature_reduction.weight", "full_image_feature_reduction.bias"})
    elif "image_branch" in params and not has_image_keys:
        raise KeyError(
            "model has an image branch (use_image) but the checkpoint carries no "
            "full_image_model.* keys — this is a no-images checkpoint; evaluate it "
            "with a no-images config instead"
        )

    # Only `weights_*` (the wrapper's registered loss-weight buffers, not
    # trained state) and BN bookkeeping counters are silently skippable; any
    # other unmapped key — including full_image.* trained weights when the
    # model has no image branch — must warn loudly.
    for key in state_dict:
        if key not in handled and not (
            key.startswith("weights_") or key.endswith("num_batches_tracked")
        ):
            unused.append(key)
    if unused:
        import warnings

        warnings.warn(
            f"import_sgpn_state_dict: {len(unused)} reference keys were NOT mapped "
            f"(trained state dropped!): {unused[:10]}{'...' if len(unused) > 10 else ''}"
        )

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out
