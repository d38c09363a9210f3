"""Image-branch tests: EfficientNet-B5 structure, frozen-trunk gradients,
and the 6-camera reduction layout."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from or4d_tpu.models.efficientnet import (
    EfficientNetB5,
    ImageBranch,
    frozen_trunk_mask,
    load_torch_efficientnet,
    sgpn_trainable_labels,
    timm_parameter_mapping,
)


@pytest.fixture(scope="module")
def branch():
    model = ImageBranch(embedding_size=768)
    imgs = jnp.zeros((1, 6, 64, 64, 3))
    variables = model.init(jax.random.key(0), imgs, train=False)
    return model, variables


class TestEfficientNet:
    def test_trunk_output_width(self):
        trunk = EfficientNetB5()
        v = trunk.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        out = trunk.apply(v, jnp.zeros((2, 64, 64, 3)))
        assert out.shape == (2, 2048)
        # B5 widths: stem 48, final block 512
        assert v["params"]["conv_stem"]["kernel"].shape[-1] == 48
        assert v["params"]["conv_head"]["kernel"].shape == (1, 1, 512, 2048)

    def test_b5_depth(self):
        trunk = EfficientNetB5()
        v = trunk.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        blocks = [k for k in v["params"] if k.startswith("block")]
        assert len(blocks) == 39  # B5: ceil(2.2 * [1,2,2,3,3,4,1]) = [3,5,5,7,7,9,3]

    def test_image_branch_shape(self, branch):
        model, variables = branch
        imgs = jnp.asarray(np.random.default_rng(0).standard_normal((2, 6, 64, 64, 3)).astype(np.float32))
        out = model.apply(variables, imgs, train=False)
        assert out.shape == (2, 768)

    def test_frozen_trunk_gradients(self, branch):
        model, variables = branch
        imgs = jnp.asarray(np.random.default_rng(1).standard_normal((1, 6, 32, 32, 3)).astype(np.float32))

        def loss(params):
            return model.apply({"params": params, "batch_stats": variables["batch_stats"]}, imgs, train=False).sum()

        g = jax.grad(loss)(variables["params"])
        # conv_head and reduction receive gradient; the stem does not
        assert float(jnp.abs(g["trunk"]["conv_head"]["kernel"]).sum()) > 0
        assert float(jnp.abs(g["reduction"]["kernel"]).sum()) > 0
        assert float(jnp.abs(g["trunk"]["conv_stem"]["kernel"]).sum()) == 0.0

    def test_trainability_mask(self, branch):
        _, variables = branch
        mask = frozen_trunk_mask(variables["params"])
        assert mask["reduction"]["kernel"] is True
        assert mask["trunk"]["conv_head"]["kernel"] is True
        assert mask["trunk"]["conv_stem"]["kernel"] is False
        assert mask["trunk"]["bn_head"]["scale"] is False

    def test_sgpn_trainable_labels(self, branch):
        _, variables = branch
        params = {"gcn": {"w": np.zeros(3)}, "image_branch": variables["params"]}
        labels = sgpn_trainable_labels(params)
        assert labels["gcn"]["w"] == "train"
        assert labels["image_branch"]["reduction"]["kernel"] == "train"
        assert labels["image_branch"]["trunk"]["conv_head"]["kernel"] == "train"
        assert labels["image_branch"]["trunk"]["conv_stem"]["kernel"] == "freeze"
        assert labels["image_branch"]["trunk"]["bn_head"]["scale"] == "freeze"
        assert labels["image_branch"]["trunk"]["block0_0"]["conv_dw"]["kernel"] == "freeze"


def _flatten(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, path + (k,))
    else:
        yield path, tree


class TestTimmImport:
    """The paper-weight import contract: the full timm tf_efficientnet_b5_ns
    state_dict maps onto the flax trunk, no tensor skipped."""

    @pytest.fixture(scope="class")
    def trunk_vars(self):
        trunk = EfficientNetB5()
        return trunk.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))

    def synthetic_state_dict(self, trunk_vars, seed=0):
        """Random tensors with the exact timm shapes, derived by inverse-
        transposing the flax shapes through the mapping table."""
        rng = np.random.default_rng(seed)
        sd = {}
        for timm_key, collection, path, kind in timm_parameter_mapping():
            node = trunk_vars[collection]
            for p in path[1:]:  # drop the 'trunk' prefix: bare-trunk variables
                node = node[p]
            shape = np.asarray(node).shape
            if kind == "conv":
                shape = (shape[3], shape[2], shape[0], shape[1])  # HWIO -> OIHW
            sd[timm_key] = rng.standard_normal(shape).astype(np.float32)
        return sd

    def test_mapping_covers_every_trunk_tensor(self, trunk_vars):
        sd = self.synthetic_state_dict(trunk_vars)
        loaded = load_torch_efficientnet(sd, trunk_vars)
        # every leaf of params AND batch_stats must differ from init
        for coll in ("params", "batch_stats"):
            for path, leaf in _flatten(loaded[coll]):
                orig = trunk_vars[coll]
                for p in path:
                    orig = orig[p]
                assert not np.allclose(np.asarray(leaf), np.asarray(orig)), (coll, path)
        # spot-check a conv transpose and a BN stat land where expected
        np.testing.assert_array_equal(
            np.asarray(loaded["params"]["conv_stem"]["kernel"]),
            sd["conv_stem.weight"].transpose(2, 3, 1, 0),
        )
        np.testing.assert_array_equal(
            np.asarray(loaded["batch_stats"]["bn_head"]["var"]), sd["bn2.running_var"]
        )
        # stage-0 DepthwiseSeparableConv renames: conv_pw -> conv_pwl, bn2 -> bn3
        np.testing.assert_array_equal(
            np.asarray(loaded["params"]["block0_0"]["conv_pwl"]["kernel"]),
            sd["blocks.0.0.conv_pw.weight"].transpose(2, 3, 1, 0),
        )

    def test_import_preserves_forward_semantics(self, trunk_vars):
        """Imported weights actually flow: forward differs from init and is
        finite (the trunk runs entirely off state_dict tensors)."""
        sd = self.synthetic_state_dict(trunk_vars, seed=3)
        # tame the random tensors: unit-variance kernels through 39 blocks
        # overflow f32; scaled weights + benign BN stats keep silu finite
        for k in list(sd):
            if k.endswith("running_var"):
                sd[k] = np.abs(sd[k]) + 1.0
            elif k.endswith("running_mean"):
                sd[k] = sd[k] * 0.01
            elif k.endswith(".weight") and sd[k].ndim == 4:
                sd[k] = sd[k] * (1.5 / np.sqrt(np.prod(sd[k].shape[1:])))
        loaded = load_torch_efficientnet(sd, trunk_vars)
        trunk = EfficientNetB5()
        x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64, 64, 3)), jnp.float32)
        y0 = trunk.apply(trunk_vars, x)
        y1 = trunk.apply(loaded, x)
        assert np.isfinite(np.asarray(y1)).all()
        assert float(jnp.abs(y1 - y0).max()) > 0

    def test_missing_and_extra_keys_raise(self, trunk_vars):
        sd = self.synthetic_state_dict(trunk_vars)
        incomplete = dict(sd)
        incomplete.pop("blocks.3.1.conv_dw.weight")
        with pytest.raises(KeyError):
            load_torch_efficientnet(incomplete, trunk_vars)
        extra = dict(sd)
        extra["classifier.weight"] = np.zeros((10, 2048), np.float32)
        with pytest.raises(KeyError):
            load_torch_efficientnet(extra, trunk_vars)
        # num_batches_tracked bookkeeping is tolerated
        ok = dict(sd)
        ok["bn1.num_batches_tracked"] = np.zeros((), np.int64)
        load_torch_efficientnet(ok, trunk_vars)

    def test_conv_transpose_matches_torch(self):
        """OIHW->HWIO covers regular, pointwise-with-bias, and depthwise
        convs — checked against live torch functional ops."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        from flax import linen as fnn

        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 8, 10, 10)).astype(np.float32)  # NCHW

        # depthwise 3x3 (the layout most likely to silently break)
        w_dw = rng.standard_normal((8, 1, 3, 3)).astype(np.float32)
        ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w_dw), padding=1, groups=8).numpy()
        conv = fnn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=8, use_bias=False)
        out = conv.apply({"params": {"kernel": jnp.asarray(w_dw.transpose(2, 3, 1, 0))}},
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4)

        # 1x1 with bias (SE convs)
        w_pw = rng.standard_normal((4, 8, 1, 1)).astype(np.float32)
        b = rng.standard_normal(4).astype(np.float32)
        ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w_pw), torch.from_numpy(b)).numpy()
        conv = fnn.Conv(4, (1, 1))
        out = conv.apply(
            {"params": {"kernel": jnp.asarray(w_pw.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}},
            jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4)
