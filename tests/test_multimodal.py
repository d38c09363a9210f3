"""Multimodal SGPN (image branch fused into the relation head) end-to-end."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from or4d_tpu.config import DatasetConfig
from or4d_tpu.data.synthetic import make_scene_batch
from or4d_tpu.models import SGPN

TINY = DatasetConfig(num_points_objects=96, num_points_relation=128, max_objects=4, max_edges=12)


class TestMultimodalSGPN:
    @pytest.fixture(scope="class")
    def setup(self):
        batch = make_scene_batch(1, seed=0, n_objects=3, ds=TINY, points_per_obj=150)
        images = np.random.default_rng(0).random((1, 6, 32, 32, 3)).astype(np.float32)
        batch = dataclasses.replace(batch, images=jnp.asarray(images))
        model = SGPN(
            num_classes=12, num_relations=15, use_image=True,
            sa_npoints=(16, 8), sa_nsamples=((4, 8), (8, 8)),
        )
        variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, train=False)
        return model, variables, batch

    def test_forward_with_images(self, setup):
        model, variables, batch = setup
        out = model.apply(variables, batch, train=False)
        assert out.rel_logprobs.shape == (1, 12, 15)
        assert np.isfinite(np.asarray(out.rel_logprobs)).all()

    def test_image_changes_rel_predictions_only(self, setup):
        """Late fusion: images shift the scene embedding (hence relation
        logits), never object logits. At random init the untrained frozen
        trunk's 39 SE gates (~0.5 each) shrink the embedding to ~1e-8
        absolute, so sensitivity is asserted RELATIVE to the embedding scale
        (a pretrained trunk has O(1) embeddings)."""
        import jax

        from or4d_tpu.models.efficientnet import ImageBranch

        model, variables, batch = setup
        out1 = model.apply(variables, batch, train=False)
        batch2 = dataclasses.replace(batch, images=batch.images + 0.5)
        out2 = model.apply(variables, batch2, train=False)
        np.testing.assert_allclose(
            np.asarray(out1.obj_logprobs), np.asarray(out2.obj_logprobs), atol=1e-6
        )
        ib = ImageBranch(embedding_size=768)
        iv = {"params": variables["params"]["image_branch"], "batch_stats": variables["batch_stats"]["image_branch"]}
        e1 = np.asarray(ib.apply(iv, batch.images, train=False))
        e2 = np.asarray(ib.apply(iv, batch2.images, train=False))
        scale = np.abs(e1).max() + 1e-30
        assert np.abs(e1 - e2).max() / scale > 1e-3

    def test_frozen_trunk_grads(self, setup):
        model, variables, batch = setup

        def loss(params):
            out = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, train=True, rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"],
            )[0]
            return out.rel_logprobs.sum()

        g = jax.grad(loss)(variables["params"])
        ib = g["image_branch"]
        assert float(jnp.abs(ib["trunk"]["conv_head"]["kernel"]).sum()) > 0
        assert float(jnp.abs(ib["trunk"]["conv_stem"]["kernel"]).sum()) == 0.0
        assert float(jnp.abs(ib["reduction"]["kernel"]).sum()) > 0
