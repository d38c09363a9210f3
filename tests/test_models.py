"""Model tests: shapes, loss semantics, gradient flow, and mask hygiene
(padding must not leak into valid outputs through BatchNorm)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from or4d_tpu.config import DatasetConfig
from or4d_tpu.data.synthetic import make_scene_batch
from or4d_tpu.models import SGPN, sgpn_loss
from or4d_tpu.models.layers import MaskedBatchNorm

# full-suite lane only: multi-minute on the 1-core runner (pytest.ini)
pytestmark = pytest.mark.slow

TINY = DatasetConfig(num_points_objects=128, num_points_relation=192, max_objects=5, max_edges=20)


@pytest.fixture(scope="module")
def batch():
    return make_scene_batch(num_scenes=2, seed=0, n_objects=4, ds=TINY, points_per_obj=400)


@pytest.fixture(scope="module")
def model_and_vars(batch):
    model = SGPN(num_classes=12, num_relations=15)
    variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, train=False)
    return model, variables


class TestMaskedBatchNorm:
    def test_masked_stats_ignore_padding(self):
        bn = MaskedBatchNorm(4, track_running_stats=False)
        x = np.random.default_rng(0).standard_normal((6, 4)).astype(np.float32)
        mask = np.array([1, 1, 1, 0, 0, 0], bool)
        v = bn.init(jax.random.key(0), jnp.asarray(x), mask=jnp.asarray(mask))
        y1 = bn.apply(v, jnp.asarray(x), mask=jnp.asarray(mask))
        x2 = x.copy()
        x2[3:] = 999.0  # garbage in padded rows
        y2 = bn.apply(v, jnp.asarray(x2), mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(y1[:3]), np.asarray(y2[:3]), atol=1e-5)

    def test_matches_torch_batchnorm_stats(self):
        # unmasked case must equal plain batch normalization
        bn = MaskedBatchNorm(3, track_running_stats=False)
        x = np.random.default_rng(1).standard_normal((16, 3)).astype(np.float32)
        v = bn.init(jax.random.key(0), jnp.asarray(x))
        y = np.asarray(bn.apply(v, jnp.asarray(x)))
        want = (x - x.mean(0)) / np.sqrt(x.var(0) + 1e-5)
        np.testing.assert_allclose(y, want, atol=1e-4)

    def test_running_stats_update_and_eval(self):
        bn = MaskedBatchNorm(2, track_running_stats=True, momentum=0.1)
        x = np.random.default_rng(2).standard_normal((32, 2)).astype(np.float32) * 3 + 1
        v = bn.init(jax.random.key(0), jnp.asarray(x))
        y, updates = bn.apply(v, jnp.asarray(x), train=True, mutable=["batch_stats"])
        stats = updates["batch_stats"]
        # torch: running = 0.9*init + 0.1*batch (unbiased var)
        np.testing.assert_allclose(np.asarray(stats["mean"]), 0.1 * x.mean(0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(stats["var"]), 0.9 * 1.0 + 0.1 * x.var(0, ddof=1), atol=1e-3)
        # eval uses the running stats
        v2 = {"params": v["params"], "batch_stats": stats}
        y_eval = np.asarray(bn.apply(v2, jnp.asarray(x), train=False))
        want = (x - np.asarray(stats["mean"])) / np.sqrt(np.asarray(stats["var"]) + 1e-5)
        np.testing.assert_allclose(y_eval, want, atol=1e-4)


class TestSGPNForward:
    def test_output_shapes(self, batch, model_and_vars):
        model, variables = model_and_vars
        out = model.apply(variables, batch, train=False)
        S, O = batch.obj_mask.shape
        E = batch.edge_mask.shape[1]
        assert out.obj_logprobs.shape == (S, O, 12)
        assert out.rel_logprobs.shape == (S, E, 15)
        assert out.gcn_rel_features.shape == (S, E, 256)

    def test_logprobs_normalized(self, batch, model_and_vars):
        model, variables = model_and_vars
        out = model.apply(variables, batch, train=False)
        sums = np.asarray(jnp.exp(out.rel_logprobs).sum(-1))
        np.testing.assert_allclose(sums, np.ones_like(sums), atol=1e-4)

    def test_padding_does_not_leak(self, batch, model_and_vars):
        """Garbage in padded object/edge slots must not change valid outputs."""
        model, variables = model_and_vars
        out1 = model.apply(variables, batch, train=False)
        poisoned = jax.tree_util.tree_map(lambda x: x, batch)
        op = np.array(batch.obj_points)
        rp = np.array(batch.rel_points)
        om = np.asarray(batch.obj_mask)
        em = np.asarray(batch.edge_mask)
        op[~om] = 77.7
        rp[~em] = -55.5
        poisoned.obj_points = jnp.asarray(op)
        poisoned.rel_points = jnp.asarray(rp)
        out2 = model.apply(variables, poisoned, train=False)
        np.testing.assert_allclose(
            np.asarray(out1.rel_logprobs)[em], np.asarray(out2.rel_logprobs)[em], atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out1.obj_logprobs)[om], np.asarray(out2.obj_logprobs)[om], atol=2e-4
        )

    def test_loss_and_grad(self, batch, model_and_vars):
        model, variables = model_and_vars
        w_obj = jnp.ones(12)
        w_rel = jnp.ones(15)

        def loss_fn(params):
            out = model.apply(
                {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
                batch,
                train=True,
                rngs={"dropout": jax.random.key(2)},
                mutable=["batch_stats"],
            )[0]
            return sgpn_loss(out, batch, w_obj, w_rel)[0]

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(loss))
        gnorm = jax.tree_util.tree_reduce(lambda a, g: a + float(jnp.sum(g * g)), grads, 0.0)
        assert gnorm > 0


class TestWeightedNLL:
    def test_matches_torch_semantics(self):
        from or4d_tpu.models.sgpn import weighted_nll

        rng = np.random.default_rng(0)
        logits = rng.standard_normal((7, 5)).astype(np.float32)
        logprobs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        targets = rng.integers(0, 5, size=7)
        w = rng.random(5).astype(np.float32)
        mask = np.array([1, 1, 1, 1, 1, 0, 0], np.float32)
        got = float(weighted_nll(jnp.asarray(logprobs), jnp.asarray(targets), jnp.asarray(w), jnp.asarray(mask)))
        # torch F.nll_loss(weight=w) over the 5 valid rows
        num = sum(-logprobs[i, targets[i]] * w[targets[i]] for i in range(5))
        den = sum(w[targets[i]] for i in range(5))
        np.testing.assert_allclose(got, num / den, rtol=1e-5)
