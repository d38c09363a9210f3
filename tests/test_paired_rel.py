"""Direction-pair sharing of relation crops (eval path).

The reference builds both directions of a pair from the same union-bbox
filter of the same scene array (data_preparation_utils.py:199-217): xyz/rgb
content, scan order, and zero-mean frame are direction-invariant; only the
mask channel swaps 1<->2. With pair-shared sampling (prep pair_shared=True)
the eval path encodes each unordered pair ONCE (shared FPS/distances/
selection) and emits both directions' features exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp

from or4d_tpu.config import DatasetConfig
from or4d_tpu.data.scene_batch import SlotPack
from or4d_tpu.data.synthetic import make_scene_batch
from or4d_tpu.models import SGPN
import pytest

# full-suite lane only: multi-minute on the 1-core runner (pytest.ini)
pytestmark = pytest.mark.slow

TINY = DatasetConfig(num_points_objects=96, num_points_relation=128, max_objects=5, max_edges=20)


def _pairs(batch):
    """(scene, fwd_slot, rev_slot) triples for every valid a<b edge."""
    eidx = np.asarray(batch.edge_index)
    emask = np.asarray(batch.edge_mask)
    out = []
    for s in range(emask.shape[0]):
        slot_of = {(int(a), int(b)): e for e, (a, b) in enumerate(eidx[s]) if emask[s, e]}
        out += [(s, e, slot_of[(b, a)]) for (a, b), e in slot_of.items() if a < b]
    return out


class TestPairSharedPrep:
    def test_crops_shared_and_mask_swapped(self):
        batch = make_scene_batch(2, seed=0, n_objects=4, ds=TINY, points_per_obj=150, pair_shared=True)
        rp = np.asarray(batch.rel_points)
        trips = _pairs(batch)
        assert trips
        for s, ef, er in trips:
            np.testing.assert_array_equal(rp[s, ef, :, :6], rp[s, er, :, :6])
            m = rp[s, ef, :, 6]
            np.testing.assert_array_equal(np.where(m > 0, 3.0 - m, 0.0), rp[s, er, :, 6])

    def test_default_prep_draws_independently(self):
        batch = make_scene_batch(1, seed=0, n_objects=4, ds=TINY, points_per_obj=150)
        rp = np.asarray(batch.rel_points)
        s, ef, er = _pairs(batch)[0]
        assert not np.array_equal(rp[s, ef, :, :6], rp[s, er, :, :6])


class TestPairPack:
    def test_pair_plan(self):
        batch = make_scene_batch(2, seed=1, n_objects=4, ds=TINY, points_per_obj=150, pair_shared=True)
        pack = SlotPack.build(batch, bucket=8, paired=True)
        n_edges = int(np.asarray(batch.edge_mask).sum())
        assert int(pack.pair_valid.sum()) == n_edges // 2
        rp = np.asarray(batch.rel_points).reshape(-1, TINY.num_points_relation, 7)
        fwd = pack.pair_idx[pack.pair_valid]
        rev = pack.pair_rev_idx[pack.pair_valid]
        np.testing.assert_array_equal(rp[fwd][..., :6], rp[rev][..., :6])

    def test_rejects_unshared_batch(self):
        batch = make_scene_batch(1, seed=1, n_objects=4, ds=TINY, points_per_obj=150)
        try:
            SlotPack.build(batch, bucket=8, paired=True)
        except ValueError as e:
            assert "pair" in str(e)
        else:
            raise AssertionError("expected ValueError for non-pair-shared batch")

    def test_sharded_pair_plan(self):
        batch = make_scene_batch(4, seed=2, n_objects=4, ds=TINY, points_per_obj=150, pair_shared=True)
        pack = SlotPack.build(batch, bucket=8, shards=2, paired=True)
        assert pack.pair_idx.shape[0] == 2
        E = TINY.max_edges
        per = 2  # scenes per shard
        rp = np.asarray(batch.rel_points).reshape(4 * E, TINY.num_points_relation, 7)
        for d in range(2):
            fwd = pack.pair_idx[d][pack.pair_valid[d]] + d * per * E
            rev = pack.pair_rev_idx[d][pack.pair_valid[d]] + d * per * E
            np.testing.assert_array_equal(rp[fwd][..., :6], rp[rev][..., :6])


class TestPairedKernel:
    def test_paired_sa_matches_unpaired_kernel(self):
        """The paired fused SA (concat planes + blockdiag W1) is exact vs the
        unpaired v4 kernel run per direction on the same crops."""
        from or4d_tpu.models.pointnet2 import SAScale, SetAbstractionMSG

        B, N = 2, 600  # N > _CHUNK so the v4 (counts) path engages
        rng = np.random.default_rng(5)
        xyz = jnp.asarray((rng.standard_normal((B, N, 3)) * 0.5).astype(np.float32))
        rgb = rng.uniform(0, 1, (B, N, 3)).astype(np.float32)
        mask_f = rng.integers(0, 3, (B, N, 1)).astype(np.float32)
        mask_r = np.where(mask_f > 0, 3.0 - mask_f, 0.0).astype(np.float32)
        feats_f = jnp.asarray(np.concatenate([rgb, mask_f], -1))
        feats_r = jnp.asarray(np.concatenate([rgb, mask_r], -1))

        scales = (SAScale(0.2, 8, (16, 24)), SAScale(0.4, 12, (16, 32)))
        mod = SetAbstractionMSG(npoint=64, scales=scales, fused_mode="eval_kernel", kernel_interpret=True)
        variables = mod.init(jax.random.key(0), xyz, feats_f, train=False)

        _, want_f = mod.apply(variables, xyz, feats_f, train=False)
        _, want_r = mod.apply(variables, xyz, feats_r, train=False)
        new_xyz, got = mod.apply(variables, xyz, feats_f, train=False, features_alt=feats_r)
        assert got.shape == (B, 64, 2, want_f.shape[-1])
        # ulp-level only: the blockdiag W1 dot may fuse reductions differently
        # per compile environment; the selection itself is exact
        np.testing.assert_allclose(np.asarray(got[:, :, 0]), np.asarray(want_f), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got[:, :, 1]), np.asarray(want_r), rtol=1e-5, atol=1e-6)

    def test_encoder_paired_kernel_vs_fallback(self):
        """PointNet2MSGEncoder paired: kernel path == interleaved fallback."""
        from or4d_tpu.models.pointnet2 import PointNet2MSGEncoder

        B, N = 2, 600
        rng = np.random.default_rng(6)
        xyz = (rng.standard_normal((B, N, 3)) * 0.5).astype(np.float32)
        rgb = rng.uniform(0, 1, (B, N, 3)).astype(np.float32)
        mask_f = rng.integers(0, 3, (B, N, 1)).astype(np.float32)
        mask_r = np.where(mask_f > 0, 3.0 - mask_f, 0.0).astype(np.float32)
        pc8 = jnp.asarray(np.concatenate([xyz, rgb, mask_f, mask_r], -1))

        kw = dict(input_dim=7, out_size=32, sa_npoints=(64, 16), sa_nsamples=((4, 8), (8, 8)))
        enc_idx = PointNet2MSGEncoder(fused_mode="index", **kw)
        variables = enc_idx.init(jax.random.key(0), pc8[..., :7], train=False)
        want = enc_idx.apply(variables, pc8, train=False, paired=True)  # fallback path
        enc_k = PointNet2MSGEncoder(fused_mode="eval_kernel", kernel_interpret=True, **kw)
        got = enc_k.apply(variables, pc8, train=False, paired=True)
        assert got.shape == (2 * B, 32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
        # paired_sa2: SA2 also runs once per pair (shared FPS/distances over
        # the SA1 centroids) — same results, same parameters
        enc_k2 = PointNet2MSGEncoder(
            fused_mode="eval_kernel", kernel_interpret=True, paired_sa2=True, **kw
        )
        got2 = enc_k2.apply(variables, pc8, train=False, paired=True)
        assert got2.shape == (2 * B, 32)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(want), rtol=1e-4, atol=1e-4)


class TestSGPNPaired:
    def test_paired_pack_matches_unpacked(self):
        """End-to-end SGPN: a paired pack on a pair-shared batch reproduces
        the unpacked forward (CPU = encoder fallback path; the kernel parity
        is covered by TestPairedKernel)."""
        batch = make_scene_batch(2, seed=3, n_objects=4, ds=TINY, points_per_obj=150, pair_shared=True)
        model = SGPN(num_classes=12, num_relations=15, sa_npoints=(16, 8), sa_nsamples=((4, 8), (8, 8)))
        variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, train=False)
        out_full = model.apply(variables, batch, train=False)
        pack = SlotPack.build(batch, bucket=8, paired=True)
        out_paired = model.apply(variables, batch, train=False, pack=pack)
        em = np.asarray(batch.edge_mask)
        np.testing.assert_allclose(
            np.asarray(out_full.rel_logprobs)[em], np.asarray(out_paired.rel_logprobs)[em], atol=2e-4
        )

    def test_paired_sharded_pack_matches_unpacked(self):
        batch = make_scene_batch(4, seed=4, n_objects=4, ds=TINY, points_per_obj=150, pair_shared=True)
        model = SGPN(num_classes=12, num_relations=15, sa_npoints=(16, 8), sa_nsamples=((4, 8), (8, 8)))
        variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, train=False)
        out_full = model.apply(variables, batch, train=False)
        pack = SlotPack.build(batch, bucket=8, shards=2, paired=True)
        out_paired = model.apply(variables, batch, train=False, pack=pack)
        em = np.asarray(batch.edge_mask)
        np.testing.assert_allclose(
            np.asarray(out_full.rel_logprobs)[em], np.asarray(out_paired.rel_logprobs)[em], atol=2e-4
        )
