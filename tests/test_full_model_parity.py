"""Full-model activation parity: imported SGPN vs the reference torch graph.

Module-level parity tests (test_torch_import.py) can miss composition errors
— a transposed mapping that cancels, a permuted scale order, a head fed from
the wrong feature. This test closes that gap: one synthesized
reference-layout state_dict drives BOTH
  * our flax SGPN through `utils.torch_import.import_sgpn_state_dict`, and
  * a functional torch-f64 mirror of the reference forward graph
    (pointnet2_modules.py:29-115 SA semantics, network_TripletGCN.py:30-80,
    network_PointNet.py:188-271 heads, scene_graph_prediction_model.py:87-109
    wiring), with FPS/ball-query neighborhoods from the numpy oracles,
and asserts end-to-end logit parity on one batch.
"""

from pathlib import Path

import jax
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from or4d_tpu.config import DatasetConfig
from or4d_tpu.data.synthetic import make_scene_batch
from or4d_tpu.models import SGPN
from or4d_tpu.utils.torch_import import import_sgpn_state_dict
from tests.reference_impls import ball_query_np, fps_np

# full-suite lane only: multi-minute on the 1-core runner (pytest.ini)
pytestmark = pytest.mark.slow

SA_NPOINTS = (32, 16)
SA_SCALES = (
    # SA1/SA2 (radius, nsample) pairs at CI sizes; widths are the paper's
    ((0.1, 4), (0.2, 8)),
    ((0.2, 8), (0.4, 8)),
)
ENC_SPECS = {
    0: {0: [None, 64, 64], 1: [None, 64, 128]},
    1: {0: [64 + 128 + 3, 128, 128], 1: [64 + 128 + 3, 128, 128]},
    2: {0: [128 + 128 + 3, 256, 256]},
}


def build_state_dict(rng, image_embedding_size: int = 0) -> dict:
    """Reference-layout SGPNModelWrapper state_dict (no-images by default;
    `image_embedding_size` widens rel fc3 the way PointNetRelCls does when
    IMAGE_INPUT == 'full', network_PointNet.py:287)."""
    sd = {}

    def conv_bn(prefix, cin, cout):
        sd[f"{prefix}.weight"] = rng.standard_normal((cout, cin, 1, 1)).astype(np.float32) * 0.2

    def bn(prefix, c, running=True):
        sd[f"{prefix}.weight"] = (1.0 + 0.1 * rng.standard_normal(c)).astype(np.float32)
        sd[f"{prefix}.bias"] = (0.1 * rng.standard_normal(c)).astype(np.float32)
        if running:
            sd[f"{prefix}.running_mean"] = (0.1 * rng.standard_normal(c)).astype(np.float32)
            sd[f"{prefix}.running_var"] = np.abs(rng.standard_normal(c)).astype(np.float32) * 0.2 + 0.8

    def linear(prefix, cin, cout):
        sd[f"{prefix}.weight"] = rng.standard_normal((cout, cin)).astype(np.float32) * 0.05
        sd[f"{prefix}.bias"] = (0.05 * rng.standard_normal(cout)).astype(np.float32)

    for enc, in_dim in (("obj_encoder", 6), ("rel_encoder", 7)):
        for s, ks in ENC_SPECS.items():
            for k, widths in ks.items():
                widths = [in_dim if w is None else w for w in widths]
                for l in range(len(widths) - 1):
                    conv_bn(f"{enc}.backbone.SA_modules.{s}.mlps.{k}.{3*l}", widths[l], widths[l + 1])
                    bn(f"{enc}.backbone.SA_modules.{s}.mlps.{k}.{3*l+1}", widths[l + 1])
    for i in range(2):
        linear(f"gcn.gconvs.{i}.nn1.0", 256 * 2 + 256, 512)
        bn(f"gcn.gconvs.{i}.nn1.1", 512, running=False)
        linear(f"gcn.gconvs.{i}.nn1.3", 512, 512 * 2 + 256)
        bn(f"gcn.gconvs.{i}.nn1.4", 512 * 2 + 256, running=False)
        linear(f"gcn.gconvs.{i}.nn2.0", 512, 512)
        bn(f"gcn.gconvs.{i}.nn2.1", 512, running=False)
        linear(f"gcn.gconvs.{i}.nn2.3", 512, 256)
    linear("obj_predictor.fc1", 256, 512)
    linear("obj_predictor.fc2", 512, 256)
    linear("obj_predictor.fc3", 256, 12)
    linear("rel_predictor.fc1", 256, 512)
    linear("rel_predictor.fc2", 512, 256)
    linear("rel_predictor.fc3", 256 + image_embedding_size + 12, 15)
    return sd


def add_full_image_keys(sd: dict, rng, image_branch_params, image_branch_stats) -> dict:
    """Synthesize the with-images checkpoint keys
    (scene_graph_prediction_model.py:50-57): `full_image_model.*` — the timm
    tf_efficientnet_b5_ns trunk in torch layout — plus
    `full_image_feature_reduction.{weight,bias}`. Shapes are derived from the
    flax tree by inverting the importer's transposes."""
    from or4d_tpu.models.efficientnet import timm_parameter_mapping

    for timm_key, collection, path, kind in timm_parameter_mapping():
        node = image_branch_params if collection == "params" else image_branch_stats
        for p in path:
            node = node[p]
        a = (rng.standard_normal(np.shape(node)) * 0.05).astype(np.float32)
        if kind == "conv":
            a = a.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        elif timm_key.endswith("running_var"):
            a = np.abs(a) + 0.8
        sd[f"full_image_model.{timm_key}"] = a
    red = image_branch_params["reduction"]
    cin, cout = np.shape(red["kernel"])
    sd["full_image_feature_reduction.weight"] = (rng.standard_normal((cout, cin)) * 0.05).astype(np.float32)
    sd["full_image_feature_reduction.bias"] = (rng.standard_normal(cout) * 0.05).astype(np.float32)
    return sd


# ----------------------------------------------------------- torch-f64 mirror

def _t(sd, key):
    return torch.from_numpy(np.asarray(sd[key])).double()


def _conv_stack(sd, prefix, nlayers, x):
    """x (..., C) channel-last; reference 1x1 Conv2d+BatchNorm2d(eval)+ReLU."""
    for l in range(nlayers):
        w = _t(sd, f"{prefix}.{3*l}.weight")[:, :, 0, 0]  # (cout, cin)
        x = x @ w.T
        x = F.batch_norm(
            x.reshape(-1, x.shape[-1]),
            _t(sd, f"{prefix}.{3*l+1}.running_mean"),
            _t(sd, f"{prefix}.{3*l+1}.running_var"),
            _t(sd, f"{prefix}.{3*l+1}.weight"),
            _t(sd, f"{prefix}.{3*l+1}.bias"),
            training=False,
        ).reshape(x.shape)
        x = F.relu(x)
    return x


def torch_encoder(sd, enc, pc):
    """Reference PointNet2ClassificationMSG forward (SA stages + GroupAll),
    eval mode; pc (R, P, C) numpy."""
    xyz = pc[..., :3].astype(np.float64)
    feats = torch.from_numpy(pc[..., 3:].astype(np.float64))
    for s, (npoint, scales) in enumerate(zip(SA_NPOINTS, SA_SCALES)):
        idx = fps_np(xyz, npoint)  # (R, npoint)
        new_xyz = np.take_along_axis(xyz, idx[..., None], axis=1)
        outs = []
        for k, (radius, nsample) in enumerate(scales):
            qidx = ball_query_np(radius, nsample, xyz, new_xyz)  # (R, M, ns)
            g_xyz = np.take_along_axis(
                xyz[:, :, None, :], qidx[..., None], axis=1
            ) - new_xyz[:, :, None, :]
            g_feat = torch.from_numpy(
                np.take_along_axis(np.asarray(feats)[:, :, None, :], qidx[..., None], axis=1)
            )
            grouped = torch.cat([torch.from_numpy(g_xyz), g_feat], dim=-1)
            nlayers = len(ENC_SPECS[s][k]) - 1
            h = _conv_stack(sd, f"{enc}.backbone.SA_modules.{s}.mlps.{k}", nlayers, grouped)
            outs.append(h.max(dim=2).values)  # (R, M, C)
        xyz = new_xyz
        feats = torch.cat(outs, dim=-1)
    # SA3: GroupAll — concat xyz + features over every point, mlp, global max
    g = torch.cat([torch.from_numpy(xyz), feats], dim=-1)
    h = _conv_stack(sd, f"{enc}.backbone.SA_modules.2.mlps.0", 2, g)
    return h.max(dim=1).values  # (R, 256)


def _gcn_mlp(sd, prefix, layers, x, on_last):
    """build_mlp: Linear -> BN1d(track_running_stats=False: BATCH stats, even
    in eval) -> ReLU, skipped on the final layer unless on_last."""
    n = len(layers)
    for i, lin_idx in enumerate(layers):
        w = _t(sd, f"{prefix}.{lin_idx}.weight")
        b = _t(sd, f"{prefix}.{lin_idx}.bias")
        x = x @ w.T + b
        if i < n - 1 or on_last:
            bn_idx = lin_idx + 1
            mean = x.mean(dim=0)
            var = x.var(dim=0, unbiased=False)
            x = (x - mean) / torch.sqrt(var + 1e-5)
            x = x * _t(sd, f"{prefix}.{bn_idx}.weight") + _t(sd, f"{prefix}.{bn_idx}.bias")
            x = F.relu(x)
    return x


def torch_gcn(sd, x, e, edge_index, num_layers=2, hidden=512, dim_edge=256):
    """TripletGCN forward (network_TripletGCN.py:40-58): torch_geometric
    default flow source_to_target — x_i is the TARGET (edge_index row 1),
    x_j the SOURCE (row 0); aggregation scatter-adds messages at targets."""
    src = torch.from_numpy(edge_index[:, 0]).long()
    dst = torch.from_numpy(edge_index[:, 1]).long()
    for i in range(num_layers):
        triplet = torch.cat([x[dst], e, x[src]], dim=1)
        h = _gcn_mlp(sd, f"gcn.gconvs.{i}.nn1", [0, 3], triplet, on_last=True)
        dx_i, new_e, dx_j = h[:, :hidden], h[:, hidden : hidden + dim_edge], h[:, hidden + dim_edge :]
        msg = dx_i + dx_j
        agg = torch.zeros((x.shape[0], hidden), dtype=torch.float64)
        agg.index_add_(0, dst, msg)
        x = _gcn_mlp(sd, f"gcn.gconvs.{i}.nn2", [0, 3], agg, on_last=False)
        e = new_e
        if i < num_layers - 1:
            x = F.relu(x)
            e = F.relu(e)
    return x, e


def torch_head(sd, prefix, x, onehot=None):
    x = F.relu(x @ _t(sd, f"{prefix}.fc1.weight").T + _t(sd, f"{prefix}.fc1.bias"))
    x = x @ _t(sd, f"{prefix}.fc2.weight").T + _t(sd, f"{prefix}.fc2.bias")
    x = F.relu(x)  # dropout inactive in eval
    if onehot is not None:
        x = torch.cat([x, torch.from_numpy(onehot).double()], dim=1)
    x = x @ _t(sd, f"{prefix}.fc3.weight").T + _t(sd, f"{prefix}.fc3.bias")
    return F.log_softmax(x, dim=-1)


class TestTorchCheckpointThroughCLI:
    """The reference's paper-weight route (main.py:74-79): a reference-layout
    .pth driven through `cli.py infer --torch-checkpoint` must reproduce the
    predictions of the flax-native import path exactly."""

    def test_cli_infer_with_pth_matches_native_import(self, tmp_path, capsys):
        import json
        import shutil

        from or4d_tpu import cli
        from or4d_tpu.config import load_config
        from or4d_tpu.data.dataset import ORDataset
        from or4d_tpu.data.vocab import DEFAULT_VOCAB
        from or4d_tpu.train.loop import Trainer

        root = tmp_path / "real_data"
        shutil.copytree(Path(__file__).parent / "golden" / "real_data", root)
        sd = build_state_dict(np.random.default_rng(3))
        pth = tmp_path / "paper_model_no_gt_no_images.pth"
        # a real paper .pth holds torch tensors (cli.py loads weights_only=True)
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, pth)

        cfg_dict = {
            "MAX_EPOCHES": 1, "LR": 1e-3, "USE_GT": True,
            "MODEL": {"sa_npoints": list(SA_NPOINTS),
                      "sa_nsamples": [[ns for _r, ns in sc] for sc in SA_SCALES]},
            "dataset": {"num_points_objects": 96, "num_points_relation": 128,
                        "data_augmentation": False},
            "TPU": {"max_objects": 10, "max_edges": 90, "scene_batch": 2,
                    "donate_state": False},
        }
        cfg_path = tmp_path / "tiny_pth.json"
        cfg_path.write_text(json.dumps(cfg_dict))
        out_json = tmp_path / "scan_relations.json"
        cache = tmp_path / "cache"

        assert cli.main([
            "infer", "--config", str(cfg_path), "--data-root", str(root),
            "--split", "train", "--cache-dir", str(cache),
            "--torch-checkpoint", str(pth), "--output", str(out_json),
        ]) == 0
        assert "imported reference torch checkpoint" in capsys.readouterr().out
        cli_rels = json.loads(out_json.read_text())
        assert cli_rels

        # native path: same .pth through import_sgpn_state_dict directly
        cfg = load_config(str(cfg_path))
        train_ds = ORDataset(cfg, "train", DEFAULT_VOCAB, data_root=root, cache_dir=cache)
        w_obj, w_rel = train_ds.weights()
        trainer = Trainer(cfg, DEFAULT_VOCAB, w_obj, w_rel)
        state = trainer.init_state(jax.random.key(42), next(train_ds.batches(2)))
        imported = import_sgpn_state_dict(
            sd, {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)})
        state = state.replace(params=imported["params"],
                              batch_stats=imported["batch_stats"])
        eval_ds = ORDataset(cfg, "train", DEFAULT_VOCAB, data_root=root,
                            cache_dir=cache, for_eval=True)
        native = trainer.predict_relations(state, eval_ds.batches(2))
        assert {k: [list(t) for t in v] for k, v in native.items()} == cli_rels


class TestWithImagesCheckpointImport:
    """Round-4 Missing #1: the with-images paper checkpoint route
    (`paper_model_no_gt_with_images.pth`, reference README.md:84-85, loaded
    raw at main.py:74-79). `full_image_model.*` (timm B5 trunk incl. the
    retrained conv_head) and `full_image_feature_reduction.*` must land on
    the flax ImageBranch — and any skipped trained key must warn loudly."""

    EMB = 12  # FULL_IMAGE_EMBEDDING_SIZE for CI (reduction: 2048 -> 2)

    @pytest.fixture(scope="class")
    def built(self, tmp_path_factory):
        import json
        import shutil

        from or4d_tpu.config import load_config
        from or4d_tpu.data.dataset import ORDataset
        from or4d_tpu.data.vocab import DEFAULT_VOCAB
        from or4d_tpu.train.loop import Trainer

        tmp_path = tmp_path_factory.mktemp("with_images")
        root = tmp_path / "real_data"
        shutil.copytree(Path(__file__).parent / "golden" / "real_data", root)
        cfg_dict = {
            "MAX_EPOCHES": 1, "LR": 1e-3, "USE_GT": True,
            "IMAGE_INPUT": "full",
            "MODEL": {"sa_npoints": list(SA_NPOINTS),
                      "sa_nsamples": [[ns for _r, ns in sc] for sc in SA_SCALES],
                      "IMAGE_MODEL": "tf_efficientnet_b5_ns",
                      "IMAGE_SIZE": 24,
                      "FULL_IMAGE_EMBEDDING_SIZE": self.EMB},
            "dataset": {"num_points_objects": 96, "num_points_relation": 128,
                        "data_augmentation": False},
            "TPU": {"max_objects": 10, "max_edges": 90, "scene_batch": 2,
                    "donate_state": False},
        }
        cfg_path = tmp_path / "tiny_image_pth.json"
        cfg_path.write_text(json.dumps(cfg_dict))
        cfg = load_config(str(cfg_path))
        cache = tmp_path / "cache"
        train_ds = ORDataset(cfg, "train", DEFAULT_VOCAB, data_root=root,
                             cache_dir=cache, synthetic_fallback=False)
        w_obj, w_rel = train_ds.weights()
        trainer = Trainer(cfg, DEFAULT_VOCAB, w_obj, w_rel)
        state = trainer.init_state(jax.random.key(5), next(train_ds.batches(2)))
        variables = {"params": jax.device_get(state.params),
                     "batch_stats": jax.device_get(state.batch_stats)}
        rng = np.random.default_rng(17)
        sd = build_state_dict(rng, image_embedding_size=self.EMB)
        sd = add_full_image_keys(sd, rng,
                                 variables["params"]["image_branch"],
                                 variables["batch_stats"]["image_branch"])
        return dict(tmp_path=tmp_path, root=root, cfg_path=cfg_path, cfg=cfg,
                    cache=cache, trainer=trainer, state=state,
                    variables=variables, sd=sd)

    def test_import_round_trips_image_branch(self, built):
        import warnings

        sd, variables = built["sd"], built["variables"]
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any unmapped-key warning fails
            imported = import_sgpn_state_dict(sd, variables)
        ib = imported["params"]["image_branch"]
        ibs = imported["batch_stats"]["image_branch"]
        # trunk stem: OIHW -> HWIO round trip
        np.testing.assert_array_equal(
            np.asarray(ib["trunk"]["conv_stem"]["kernel"]),
            sd["full_image_model.conv_stem.weight"].transpose(2, 3, 1, 0))
        # the retrained conv_head (the whole point of the with-images route)
        np.testing.assert_array_equal(
            np.asarray(ib["trunk"]["conv_head"]["kernel"]),
            sd["full_image_model.conv_head.weight"].transpose(2, 3, 1, 0))
        # running stats land in batch_stats
        np.testing.assert_array_equal(
            np.asarray(ibs["trunk"]["bn_stem"]["mean"]),
            sd["full_image_model.bn1.running_mean"])
        # per-camera reducer (Linear transpose)
        np.testing.assert_array_equal(
            np.asarray(ib["reduction"]["kernel"]),
            sd["full_image_feature_reduction.weight"].T)
        np.testing.assert_array_equal(
            np.asarray(ib["reduction"]["bias"]),
            sd["full_image_feature_reduction.bias"])

    def test_cli_evaluate_matches_native_import(self, built, capsys):
        import json

        from or4d_tpu import cli
        from or4d_tpu.data.dataset import ORDataset
        from or4d_tpu.data.vocab import DEFAULT_VOCAB

        pth = built["tmp_path"] / "paper_model_no_gt_with_images.pth"
        torch.save({k: torch.from_numpy(v) for k, v in built["sd"].items()}, pth)
        assert cli.main([
            "evaluate", "--config", str(built["cfg_path"]),
            "--data-root", str(built["root"]), "--split", "train",
            "--cache-dir", str(built["cache"]),
            "--torch-checkpoint", str(pth),
        ]) == 0
        out = capsys.readouterr().out
        assert "imported reference torch checkpoint" in out
        cli_f1 = json.loads(out.strip().splitlines()[-1])["relation_macro_f1"]

        # native path: same sd through import_sgpn_state_dict directly
        state = built["state"]
        imported = import_sgpn_state_dict(built["sd"], built["variables"])
        state = state.replace(params=imported["params"],
                              batch_stats=imported["batch_stats"])
        eval_ds = ORDataset(built["cfg"], "train", DEFAULT_VOCAB,
                            data_root=built["root"], cache_dir=built["cache"],
                            pair_shared=True)
        native_f1 = built["trainer"].evaluate(state, eval_ds.batches(2))
        assert cli_f1 == pytest.approx(native_f1, abs=1e-9)

    def test_with_images_sd_into_no_image_model_warns_loudly(self, built):
        """Trained full_image.* weights that cannot land anywhere must warn
        (the round-4 silent-skip bug)."""
        tiny = DatasetConfig(num_points_objects=96, num_points_relation=128,
                             max_objects=4, max_edges=12, data_augmentation=False)
        batch = make_scene_batch(1, seed=7, n_objects=4, ds=tiny, points_per_obj=150)
        model = SGPN(num_classes=12, num_relations=15, sa_npoints=SA_NPOINTS,
                     sa_nsamples=tuple(tuple(ns for _r, ns in sc) for sc in SA_SCALES))
        variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                               batch, train=False)
        sd = {k: v for k, v in built["sd"].items()}
        sd["rel_predictor.fc3.weight"] = np.random.default_rng(0).standard_normal(
            (15, 256 + 12)).astype(np.float32) * 0.05  # no-image fc3 width
        with pytest.warns(UserWarning, match="trained state dropped"):
            import_sgpn_state_dict(sd, {"params": jax.device_get(variables["params"]),
                                        "batch_stats": jax.device_get(variables["batch_stats"])})

    def test_no_images_sd_into_image_model_raises(self, built):
        sd = build_state_dict(np.random.default_rng(3), image_embedding_size=self.EMB)
        with pytest.raises(KeyError, match="no-images checkpoint"):
            import_sgpn_state_dict(sd, built["variables"])


class TestFullModelActivationParity:
    @pytest.fixture(scope="class")
    def setup(self):
        # every slot valid (n_objects == max_objects) so masked statistics
        # coincide with the reference's ragged batch-of-1 exactly
        tiny = DatasetConfig(num_points_objects=96, num_points_relation=128,
                             max_objects=4, max_edges=12, data_augmentation=False)
        batch = make_scene_batch(1, seed=7, n_objects=4, ds=tiny, points_per_obj=150)
        assert bool(np.asarray(batch.obj_mask).all()) and bool(np.asarray(batch.edge_mask).all())
        model = SGPN(num_classes=12, num_relations=15, sa_npoints=SA_NPOINTS,
                     sa_nsamples=tuple(tuple(ns for _r, ns in sc) for sc in SA_SCALES))
        variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, train=False)
        sd = build_state_dict(np.random.default_rng(11))
        imported = import_sgpn_state_dict(sd, variables)
        out = model.apply(imported, batch, train=False)
        return sd, batch, out

    def test_logits_match_reference_graph(self, setup):
        sd, batch, out = setup
        obj_pc = np.asarray(batch.obj_points)[0]  # (O, P, 6)
        rel_pc = np.asarray(batch.rel_points)[0]  # (E, P, 7)
        edge_index = np.asarray(batch.edge_index)[0]
        onehot = np.asarray(batch.rel_onehot)[0]

        obj_feat = torch_encoder(sd, "obj_encoder", obj_pc)
        rel_feat = torch_encoder(sd, "rel_encoder", rel_pc)
        gcn_x, gcn_e = torch_gcn(sd, obj_feat, rel_feat, edge_index)
        obj_lp = torch_head(sd, "obj_predictor", gcn_x)
        rel_lp = torch_head(sd, "rel_predictor", gcn_e, onehot=onehot)

        got_obj = np.asarray(out.obj_logprobs)[0]
        got_rel = np.asarray(out.rel_logprobs)[0]
        want_obj = obj_lp.numpy()
        want_rel = rel_lp.numpy()
        # f32 flax vs f64 torch: composition errors are O(1); float noise
        # through the 512-wide chains stays well under these tolerances
        np.testing.assert_allclose(got_obj, want_obj, atol=5e-3, rtol=1e-3)
        np.testing.assert_allclose(got_rel, want_rel, atol=5e-3, rtol=1e-3)
        assert (got_obj.argmax(-1) == want_obj.argmax(-1)).all()
        assert (got_rel.argmax(-1) == want_rel.argmax(-1)).all()
