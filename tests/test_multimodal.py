"""Multimodal SGPN (image branch fused into the relation head) end-to-end."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from or4d_tpu.config import DatasetConfig
from or4d_tpu.data.synthetic import make_scene_batch
from or4d_tpu.models import SGPN

# full-suite lane only: multi-minute on the 1-core runner (pytest.ini)
pytestmark = pytest.mark.slow

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


class TestImageLoading:
    """load_full_image_data on the real-format fixture
    (data_preparation_utils.py:296-310 semantics)."""

    ROOT = None

    @classmethod
    def setup_class(cls):
        from pathlib import Path

        cls.ROOT = Path(__file__).parent / "golden" / "real_data"

    def test_shapes_and_determinism(self):
        from or4d_tpu.data.images import load_full_image_data

        a = load_full_image_data(self.ROOT, 1, "000000", image_size=32)
        b = load_full_image_data(self.ROOT, 1, "000000", image_size=32)
        assert a.shape == (6, 32, 32, 3) and a.dtype == np.float32
        np.testing.assert_array_equal(a, b)
        # per-camera hue differs in the fixture -> cameras must not be equal
        assert np.abs(a[0] - a[3]).max() > 0.05

    def test_frames_list_is_index_addressed(self):
        """The reference indexes the json list by int(pcd_idx); color frame
        indices differ from pcd indices in the fixture, so a key-lookup bug
        would read the wrong jpg."""
        from or4d_tpu.data.images import load_full_image_data

        a = load_full_image_data(self.ROOT, 1, "000000", image_size=24)
        b = load_full_image_data(self.ROOT, 1, "000001", image_size=24)
        assert np.abs(a - b).max() > 0.05

    def test_transform_normalization_exact(self):
        """A constant-color image survives resize/crop exactly, so the
        normalize step is checked in closed form."""
        from PIL import Image

        from or4d_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD, b5_transform

        img = Image.new("RGB", (100, 80), (128, 64, 255))
        out = b5_transform(img, image_size=16)
        expected = (np.array([128, 64, 255], np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        np.testing.assert_allclose(out, np.broadcast_to(expected, (16, 16, 3)), atol=1e-5)

    def test_crop_is_center(self):
        """Shorter side -> floor(size/0.934), then center crop: for a wide
        image the left/right margins are trimmed symmetrically."""
        from PIL import Image

        from or4d_tpu.data.images import b5_transform

        # left half black, right half white; center crop straddles the seam
        arr = np.zeros((60, 120, 3), np.uint8)
        arr[:, 60:] = 255
        out = b5_transform(Image.fromarray(arr), image_size=20)
        # un-normalize channel 0 to [0,1]
        vals = out[..., 0] * 0.229 + 0.485
        assert vals[:, :8].mean() < 0.2 and vals[:, -8:].mean() > 0.8


class TestMultimodalTraining:
    """no_gt_image end to end: ORDataset loads fixture jpgs, the Trainer
    masks the frozen trunk out of AdamW, loss is finite and trainable
    params move while the trunk stays put."""

    def test_train_two_steps_on_fixture(self, tmp_path):
        from pathlib import Path

        from or4d_tpu.config import ExperimentConfig, ModelConfig, TPUConfig
        from or4d_tpu.data.dataset import ORDataset
        from or4d_tpu.data.vocab import DEFAULT_VOCAB
        from or4d_tpu.train.loop import Trainer

        root = Path(__file__).parent / "golden" / "real_data"
        cfg = ExperimentConfig(
            name="tiny_image",
            lr=1e-3,
            use_gt=True,
            image_input="full",
            # fixture scans have up to 6 objects; module TINY caps at 4
            dataset=dataclasses.replace(TINY, max_objects=6, max_edges=30),
            model=ModelConfig(
                sa_npoints=(16, 8), sa_nsamples=((4, 8), (8, 8)),
                image_model="tf_efficientnet_b5_ns", image_size=24,
                full_image_embedding_size=12,
            ),
            tpu=TPUConfig(scene_batch=2, donate_state=False),
        )
        ds = ORDataset(cfg, "train", DEFAULT_VOCAB, data_root=root,
                       cache_dir=tmp_path, synthetic_fallback=False)
        batch = next(ds.batches(2))
        assert batch.images is not None and batch.images.shape == (2, 6, 24, 24, 3)

        w_obj, w_rel = ds.weights()
        tr = Trainer(cfg, DEFAULT_VOCAB, w_obj, w_rel)
        state = tr.init_state(jax.random.key(0), batch)
        p0 = jax.tree_util.tree_map(np.asarray, state.params)
        for step in range(2):
            state, parts, _ = tr.train_step(state, batch, jax.random.key(step))
            assert np.isfinite(float(parts["loss"]))
        p1 = state.params
        trunk0, trunk1 = p0["image_branch"]["trunk"], p1["image_branch"]["trunk"]
        # frozen: any non-head trunk tensor is bit-identical
        np.testing.assert_array_equal(
            np.asarray(trunk1["conv_stem"]["kernel"]), trunk0["conv_stem"]["kernel"])
        np.testing.assert_array_equal(
            np.asarray(trunk1["block2_0"]["conv_dw"]["kernel"]), trunk0["block2_0"]["conv_dw"]["kernel"])
        np.testing.assert_array_equal(
            np.asarray(trunk1["bn_head"]["scale"]), trunk0["bn_head"]["scale"])
        # trainable: conv_head and the reduction moved
        assert np.abs(np.asarray(trunk1["conv_head"]["kernel"]) - trunk0["conv_head"]["kernel"]).max() > 0
        assert np.abs(np.asarray(p1["image_branch"]["reduction"]["kernel"])
                      - p0["image_branch"]["reduction"]["kernel"]).max() > 0
