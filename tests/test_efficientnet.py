"""Image-branch tests: EfficientNet-B5 structure, frozen-trunk gradients,
and the 6-camera reduction layout."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from or4d_tpu.models.efficientnet import EfficientNetB5, ImageBranch, frozen_trunk_mask


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
