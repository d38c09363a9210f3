"""Fused serving-SA1 kernel (ops/pallas_serving_mlp.py): the channel-major
VMEM chain must reproduce the XLA from_grouped serving path exactly — the
kernel only moves WHERE the chain runs (VMEM vs HBM intermediates), never
what is computed. Interpret-mode (CPU) parity at every level: raw kernel vs
an explicit chain reference, SA module with channel-major vs row-major
caches, and the SGPN fallback path for a channel-major cache off-TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from or4d_tpu.config import DatasetConfig
from or4d_tpu.data.scene_batch import SlotPack
from or4d_tpu.data.synthetic import make_scene_batch
from or4d_tpu.models import SGPN
from or4d_tpu.models.pointnet2 import SAScale, SetAbstractionMSG
from or4d_tpu.ops.pallas_serving_mlp import serving_sa1_mlp_pallas
from or4d_tpu.serving import build_sa1_cache, build_sgpn_sa1_caches

TINY = DatasetConfig(num_points_objects=96, num_points_relation=128,
                     max_objects=4, max_edges=12, data_augmentation=False)


def _chain_reference(g_cm, Bq, W0, a0, b0, W1, a1, b1, c0, ns):
    """The serving chain in plain jnp, mirroring the kernel's dtype flow:
    A = dtype(f32-accum g_s @ W0); f32 affine/relu; dtype matmul; slot max."""
    R, c0p, ns_mp = g_cm.shape
    M = Bq.shape[1]
    # slot-flattened (R, C0p, ns*Mp) -> (R, M, ns, C0)
    g = (g_cm.reshape(R, c0p, ns, ns_mp // ns)[:, :c0, :, :M]
         .transpose(0, 3, 2, 1))
    A = jnp.einsum(
        "rmsc,cd->rmsd", g.astype(jnp.float32), W0.astype(jnp.float32)
    ).astype(W0.dtype)
    val = A.astype(jnp.float32)
    h = jnp.maximum((val - Bq.astype(jnp.float32)[:, :, None, :]) * a0 + b0, 0.0)
    hw = jnp.einsum(
        "rmsc,cd->rmsd", h.astype(W1.dtype).astype(jnp.float32), W1.astype(jnp.float32)
    )
    o = jnp.maximum(hw * a1 + b1, 0.0)
    return jnp.max(o, axis=2).astype(W0.dtype)  # (R, M, C2)


def _rand_inputs(dtype, R=3, ns=4, c0=7, M=16, C1=8, C2=16, seed=0):
    k = jax.random.split(jax.random.key(seed), 8)
    c0p = 8
    mp = -(-M // 8) * 8
    g = jax.random.normal(k[0], (R, c0p, ns, mp))
    g = g.at[:, c0:].set(0.0).at[:, :, :, M:].set(0.0)
    g = g.reshape(R, c0p, ns * mp).astype(dtype)
    Bq = jax.random.normal(k[1], (R, M, C1)).astype(dtype)
    W0 = jax.random.normal(k[2], (c0, C1)).astype(dtype)
    a0 = jax.random.normal(k[3], (C1,)) * 0.5 + 1.0
    b0 = jax.random.normal(k[4], (C1,)) * 0.1
    W1 = jax.random.normal(k[5], (C1, C2)).astype(dtype)
    a1 = jax.random.normal(k[6], (C2,)) * 0.5 + 1.0
    b1 = jax.random.normal(k[7], (C2,)) * 0.1
    return g, Bq, W0, a0, b0, W1, a1, b1, c0, ns


class TestServingKernel:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_kernel_matches_chain_reference(self, dtype):
        g, Bq, W0, a0, b0, W1, a1, b1, c0, ns = _rand_inputs(dtype)
        out = serving_sa1_mlp_pallas(g, Bq, W0, a0, b0, W1, a1, b1, ns, True)
        ref = _chain_reference(g, Bq, W0, a0, b0, W1, a1, b1, c0, ns)
        # f32: the einsum reference reassociates the K-dim sum vs the kernel
        # dot — accumulation-order noise only (observed max rel 1.6e-7)
        atol = 1e-4 if dtype == jnp.float32 else 1e-1
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=0, atol=atol
        )

    @pytest.mark.parametrize("rows,chunk", [(1, 1), (4, 2), (8, 4)])
    def test_kernel_row_blocks_and_chunks(self, rows, chunk):
        # rb rows per grid program x chunk slots per MXU op: pure scheduling
        # knobs — results must match the reference for every combination
        g, Bq, W0, a0, b0, W1, a1, b1, c0, ns = _rand_inputs(jnp.float32, R=8)
        out = serving_sa1_mlp_pallas(g, Bq, W0, a0, b0, W1, a1, b1, ns, True, chunk, rows)
        ref = _chain_reference(g, Bq, W0, a0, b0, W1, a1, b1, c0, ns)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=1e-4
        )

    def test_kernel_pads_m_to_sublane(self):
        # M=12 -> cache rows padded to Mp=16, output sliced back
        g, Bq, W0, a0, b0, W1, a1, b1, c0, ns = _rand_inputs(jnp.float32, M=12)
        out = serving_sa1_mlp_pallas(g, Bq, W0, a0, b0, W1, a1, b1, ns, True)
        ref = _chain_reference(g, Bq, W0, a0, b0, W1, a1, b1, c0, ns)
        assert out.shape == ref.shape
        # f32 accumulation-order noise only (einsum reference vs chunked dot)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0, atol=1e-4)

    def test_sa_module_cm_cache_matches_row_major(self):
        # SetAbstractionMSG cache branch: kernel (interpret) off the
        # channel-major cache vs the XLA from_grouped path off the row-major
        # cache — same crops, same params
        R, P, C = 5, 200, 7
        pc = jax.random.normal(jax.random.key(3), (R, P, C))
        pc = pc.at[..., :3].multiply(0.5)
        scales = ((0.4, 4), (0.8, 8))
        sa_kw = dict(
            npoint=32,
            scales=(SAScale(0.4, 4, (8, 8)), SAScale(0.8, 8, (8, 16))),
        )
        sa_plain = SetAbstractionMSG(**sa_kw)
        sa_kernel = SetAbstractionMSG(**sa_kw, kernel_interpret=True)
        xyz, feats = pc[..., :3], pc[..., 3:]
        variables = sa_plain.init(jax.random.key(0), xyz, feats, train=False)
        cache_rm = build_sa1_cache(pc, 32, scales)
        cache_cm = build_sa1_cache(pc, 32, scales, channel_major=True)
        assert cache_cm.channel_major and cache_cm.c0 == C
        assert cache_cm.grouped[0].shape == (R, 8, 4 * 32)
        ref_xyz, ref = sa_plain.apply(variables, None, None, train=False, cache=cache_rm)
        out_xyz, out = sa_kernel.apply(variables, None, None, train=False, cache=cache_cm)
        np.testing.assert_array_equal(np.asarray(ref_xyz), np.asarray(out_xyz))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0, atol=2e-5)

    def test_sa_module_cm_cache_fallback_off_kernel(self):
        # a channel-major cache on a backend without the kernel (no
        # kernel_interpret, CPU) must fall back to from_grouped via the
        # layout-restoring transpose — bit-identical to the row-major cache
        R, P, C = 4, 150, 6
        pc = jax.random.normal(jax.random.key(5), (R, P, C))
        sa = SetAbstractionMSG(
            npoint=16, scales=(SAScale(0.5, 4, (8, 8)), SAScale(1.0, 8, (8, 16)))
        )
        xyz, feats = pc[..., :3], pc[..., 3:]
        variables = sa.init(jax.random.key(0), xyz, feats, train=False)
        scales = ((0.5, 4), (1.0, 8))
        cache_rm = build_sa1_cache(pc, 16, scales)
        cache_cm = build_sa1_cache(pc, 16, scales, channel_major=True)
        _, ref = sa.apply(variables, None, None, train=False, cache=cache_rm)
        _, out = sa.apply(variables, None, None, train=False, cache=cache_cm)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_sgpn_cm_caches_end_to_end(self):
        # full-model serving with channel-major caches (fallback path on
        # CPU) == row-major serving == already-parity-tested vs cold
        batch = make_scene_batch(2, seed=8, n_objects=4, ds=TINY, points_per_obj=150)
        model = SGPN(num_classes=12, num_relations=15, sa_npoints=(32, 16),
                     sa_nsamples=((4, 8), (8, 8)))
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, train=False
        )
        pack = SlotPack.build(batch)
        caches_rm = build_sgpn_sa1_caches(model, batch, pack, channel_major=False)
        caches_cm = build_sgpn_sa1_caches(model, batch, pack, channel_major=True)
        ref = model.apply(variables, batch, train=False, pack=pack, sa1_caches=caches_rm)
        out = model.apply(variables, batch, train=False, pack=pack, sa1_caches=caches_cm)
        np.testing.assert_array_equal(
            np.asarray(out.rel_logprobs), np.asarray(ref.rel_logprobs)
        )

    def test_dp4_evaluator_channel_major_matches_flat(self):
        # ServingEvaluator with channel-major caches on a dp=4 CPU mesh
        # (forced — auto picks cm only on TPU): same macro-F1 as the flat
        # row-major evaluator. Exercises the cm layout through sharding,
        # offload bookkeeping, and the SGPN fallback branch end to end.
        from or4d_tpu.config import ExperimentConfig, ModelConfig, TPUConfig
        from or4d_tpu.data.vocab import DEFAULT_VOCAB
        from or4d_tpu.serving import ServingEvaluator
        from or4d_tpu.train.loop import Trainer

        base = dict(
            dataset=TINY,
            model=ModelConfig(sa_npoints=(32, 16), sa_nsamples=((4, 8), (8, 8))),
        )
        batches = [make_scene_batch(4, seed=9, n_objects=4, ds=TINY, points_per_obj=150)]
        cfg1 = ExperimentConfig(
            tpu=TPUConfig(scene_batch=4, donate_state=False, mesh_data=1, mesh_model=1), **base
        )
        tr1 = Trainer(cfg1, DEFAULT_VOCAB, np.ones(12, np.float32), np.ones(15, np.float32))
        state = tr1.init_state(jax.random.key(0), batches[0])
        f1_flat = ServingEvaluator(tr1, batches, channel_major=False).evaluate(state)
        cfg4 = ExperimentConfig(
            tpu=TPUConfig(scene_batch=4, donate_state=False, mesh_data=4, mesh_model=1), **base
        )
        tr4 = Trainer(cfg4, DEFAULT_VOCAB, np.ones(12, np.float32), np.ones(15, np.float32))
        ev4 = ServingEvaluator(tr4, batches, channel_major=True)
        assert ev4.batches[0][2][0].channel_major
        assert abs(ev4.evaluate(state) - f1_flat) < 1e-6

    def test_cm_cache_npz_roundtrip(self, tmp_path):
        from or4d_tpu.serving import _load_caches, _save_caches

        batch = make_scene_batch(1, seed=8, n_objects=4, ds=TINY, points_per_obj=150)
        model = SGPN(num_classes=12, num_relations=15, sa_npoints=(32, 16),
                     sa_nsamples=((4, 8), (8, 8)))
        caches = build_sgpn_sa1_caches(model, batch, channel_major=True)
        path = tmp_path / "c.npz"
        _save_caches(path, jax.tree_util.tree_map(np.asarray, caches))
        loaded = _load_caches(path)
        for orig, back in zip(caches, loaded):
            assert back.channel_major and back.c0 == orig.c0
            np.testing.assert_array_equal(np.asarray(orig.new_xyz), back.new_xyz)
            for a, b in zip(orig.grouped, back.grouped):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
