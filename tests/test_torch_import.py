"""Paper-weight import tests, including a real torch-vs-JAX math parity check
on the classifier heads and TripletGCN (Linear/BN/log_softmax path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from or4d_tpu.models.heads import ObjectClsHead, RelationClsHead
from or4d_tpu.models.layers import MLP
from or4d_tpu.utils.torch_import import import_sgpn_state_dict


def torch_head(num_classes, in_size=256):
    import torch.nn as nn

    class Head(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = nn.Linear(in_size, 512)
            self.fc2 = nn.Linear(512, 256)
            self.fc3 = nn.Linear(256, num_classes)

        def forward(self, x):
            x = torch.relu(self.fc1(x))
            x = torch.relu(self.fc2(x))
            return torch.log_softmax(self.fc3(x), dim=1)

    return Head()


class TestHeadParity:
    def test_object_head_matches_torch(self):
        th = torch_head(12)
        x = np.random.default_rng(0).standard_normal((9, 256)).astype(np.float32)
        want = th(torch.from_numpy(x)).detach().numpy()

        head = ObjectClsHead(num_classes=12)
        variables = head.init(jax.random.key(0), jnp.asarray(x), train=False)
        params = jax.tree_util.tree_map(np.asarray, variables["params"])
        for fc in ("fc1", "fc2", "fc3"):
            params[fc]["kernel"] = getattr(th, fc).weight.detach().numpy().T
            params[fc]["bias"] = getattr(th, fc).bias.detach().numpy()
        got = np.asarray(head.apply({"params": params}, jnp.asarray(x), train=False))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_relation_head_one_hot_fusion_matches_torch(self):
        import torch.nn as nn

        class RelHead(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = nn.Linear(256, 512)
                self.fc2 = nn.Linear(512, 256)
                self.fc3 = nn.Linear(256 + 12, 15)

            def forward(self, x, onehot):
                x = torch.relu(self.fc1(x))
                x = torch.relu(self.fc2(x))
                x = torch.cat([x, onehot], dim=1)
                return torch.log_softmax(self.fc3(x), dim=1)

        th = RelHead()
        rng = np.random.default_rng(1)
        x = rng.standard_normal((7, 256)).astype(np.float32)
        oh = (rng.random((7, 12)) < 0.2).astype(np.float32)
        want = th(torch.from_numpy(x), torch.from_numpy(oh)).detach().numpy()

        head = RelationClsHead(num_relations=15)
        variables = head.init(jax.random.key(0), jnp.asarray(x), relation_objects_one_hot=jnp.asarray(oh), train=False)
        params = jax.tree_util.tree_map(np.asarray, variables["params"])
        for fc in ("fc1", "fc2", "fc3"):
            params[fc]["kernel"] = getattr(th, fc).weight.detach().numpy().T
            params[fc]["bias"] = getattr(th, fc).bias.detach().numpy()
        got = np.asarray(head.apply({"params": params}, jnp.asarray(x), relation_objects_one_hot=jnp.asarray(oh), train=False))
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestMLPBNParity:
    def test_build_mlp_with_batchnorm_matches_torch(self):
        """The TripletGCN build_mlp block (Linear->BN(no stats)->ReLU) must
        match torch batch-stat normalization."""
        import torch.nn as nn

        tm = nn.Sequential(
            nn.Linear(8, 16), nn.BatchNorm1d(16, track_running_stats=False), nn.ReLU(), nn.Linear(16, 4)
        )
        tm.eval()  # track_running_stats=False -> still uses batch stats
        x = np.random.default_rng(2).standard_normal((32, 8)).astype(np.float32)
        want = tm(torch.from_numpy(x)).detach().numpy()

        m = MLP((16, 4), do_bn=True)
        variables = m.init(jax.random.key(0), jnp.asarray(x), train=True)
        params = jax.tree_util.tree_map(np.asarray, variables["params"])
        params["dense_0"]["kernel"] = tm[0].weight.detach().numpy().T
        params["dense_0"]["bias"] = tm[0].bias.detach().numpy()
        params["bn_0"]["scale"] = tm[1].weight.detach().numpy()
        params["bn_0"]["bias"] = tm[1].bias.detach().numpy()
        params["dense_1"]["kernel"] = tm[3].weight.detach().numpy().T
        params["dense_1"]["bias"] = tm[3].bias.detach().numpy()
        got = np.asarray(m.apply({"params": params}, jnp.asarray(x), train=True))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestStateDictImport:
    def test_full_sgpn_import_from_synthetic_torch_layout(self):
        """Round-trip: build a fake reference-layout state_dict with the
        right shapes and import it; all mapped leaves must change."""
        from or4d_tpu.config import DatasetConfig
        from or4d_tpu.data.synthetic import make_scene_batch
        from or4d_tpu.models import SGPN

        tiny = DatasetConfig(num_points_objects=96, num_points_relation=128, max_objects=4, max_edges=12)
        batch = make_scene_batch(1, seed=0, n_objects=3, ds=tiny, points_per_obj=150)
        model = SGPN(num_classes=12, num_relations=15, sa_npoints=(32, 16), sa_nsamples=((4, 8), (8, 8)))
        variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, train=False)

        rng = np.random.default_rng(3)
        sd = {}

        def conv_bn(prefix, cin, cout):
            sd[f"{prefix}.weight"] = rng.standard_normal((cout, cin, 1, 1)).astype(np.float32)

        def bn(prefix, c, running=True):
            sd[f"{prefix}.weight"] = rng.standard_normal(c).astype(np.float32)
            sd[f"{prefix}.bias"] = rng.standard_normal(c).astype(np.float32)
            if running:
                sd[f"{prefix}.running_mean"] = rng.standard_normal(c).astype(np.float32)
                sd[f"{prefix}.running_var"] = np.abs(rng.standard_normal(c)).astype(np.float32) + 0.5

        def linear(prefix, cin, cout):
            sd[f"{prefix}.weight"] = rng.standard_normal((cout, cin)).astype(np.float32)
            sd[f"{prefix}.bias"] = rng.standard_normal(cout).astype(np.float32)

        for enc, in_dim in (("obj_encoder", 6), ("rel_encoder", 7)):
            specs = {
                0: {0: [in_dim, 64, 64], 1: [in_dim, 64, 128]},
                1: {0: [64 + 128 + 3, 128, 128], 1: [64 + 128 + 3, 128, 128]},
                2: {0: [128 + 128 + 3, 256, 256]},
            }
            for s, ks in specs.items():
                for k, widths in ks.items():
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
        linear("rel_predictor.fc3", 256 + 12, 15)

        imported = import_sgpn_state_dict(sd, variables)
        # spot checks: transposition + running stats landed
        np.testing.assert_allclose(
            imported["params"]["obj_predictor"]["fc1"]["kernel"], sd["obj_predictor.fc1.weight"].T
        )
        np.testing.assert_allclose(
            imported["params"]["obj_encoder"]["sa1"]["mlp_0"]["dense_0"]["kernel"],
            sd["obj_encoder.backbone.SA_modules.0.mlps.0.0.weight"][:, :, 0, 0].T,
        )
        np.testing.assert_allclose(
            imported["batch_stats"]["rel_encoder"]["sa2"]["mlp_1"]["bn_0"]["mean"],
            sd["rel_encoder.backbone.SA_modules.1.mlps.1.1.running_mean"],
        )
        # model still runs with imported weights
        out = model.apply(imported, batch, train=False)
        assert np.isfinite(np.asarray(out.rel_logprobs)).all()
