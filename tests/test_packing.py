"""Slot packing: packed and unpacked forwards must agree on valid slots."""

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


class TestSlotPack:
    def test_build_plan(self):
        batch = make_scene_batch(2, seed=0, n_objects=3, ds=TINY, points_per_obj=150)
        pack = SlotPack.build(batch, bucket=8)
        n_edges = int(np.asarray(batch.edge_mask).sum())
        n_objs = int(np.asarray(batch.obj_mask).sum())
        assert pack.edge_valid.sum() == n_edges
        assert pack.obj_valid.sum() == n_objs
        assert len(pack.edge_idx) % 8 == 0
        # indices point at exactly the valid flat slots
        flat = np.asarray(batch.edge_mask).reshape(-1)
        assert flat[pack.edge_idx[pack.edge_valid]].all()

    def test_packed_forward_matches_unpacked(self):
        batch = make_scene_batch(2, seed=1, n_objects=4, ds=TINY, points_per_obj=150)
        model = SGPN(num_classes=12, num_relations=15, sa_npoints=(16, 8), sa_nsamples=((4, 8), (8, 8)))
        variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, train=False)
        out_full = model.apply(variables, batch, train=False)
        pack = SlotPack.build(batch, bucket=8)
        out_packed = model.apply(variables, batch, train=False, pack=pack)
        em = np.asarray(batch.edge_mask)
        om = np.asarray(batch.obj_mask)
        np.testing.assert_allclose(
            np.asarray(out_full.rel_logprobs)[em], np.asarray(out_packed.rel_logprobs)[em], atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out_full.obj_logprobs)[om], np.asarray(out_packed.obj_logprobs)[om], atol=2e-4
        )


class TestShardedPack:
    def test_per_shard_plan(self):
        batch = make_scene_batch(4, seed=2, n_objects=4, ds=TINY, points_per_obj=150)
        pack = SlotPack.build(batch, bucket=8, shards=4)
        assert pack.edge_idx.shape[0] == 4 and pack.edge_idx.ndim == 2
        em = np.asarray(batch.edge_mask)  # (4, E)
        for d in range(4):
            # local indices into this shard's (1 scene x E) block
            flat = em[d].reshape(-1)
            idx = pack.edge_idx[d][pack.edge_valid[d]]
            assert flat[idx].all()
            assert pack.edge_valid[d].sum() == flat.sum()

    def test_sharded_pack_forward_matches_unpacked(self):
        batch = make_scene_batch(4, seed=3, n_objects=4, ds=TINY, points_per_obj=150)
        model = SGPN(num_classes=12, num_relations=15, sa_npoints=(16, 8), sa_nsamples=((4, 8), (8, 8)))
        variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, train=False)
        out_full = model.apply(variables, batch, train=False)
        pack = SlotPack.build(batch, bucket=8, shards=4)
        out_packed = model.apply(variables, batch, train=False, pack=pack)
        em = np.asarray(batch.edge_mask)
        om = np.asarray(batch.obj_mask)
        np.testing.assert_allclose(
            np.asarray(out_full.rel_logprobs)[em], np.asarray(out_packed.rel_logprobs)[em], atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out_full.obj_logprobs)[om], np.asarray(out_packed.obj_logprobs)[om], atol=2e-4
        )

    def test_dp4_train_loss_matches_unpacked(self):
        """The scored multi-chip criterion: on a dp=4 CPU mesh the per-shard
        packed train step must produce the same loss as the unpacked step."""
        from or4d_tpu.config import ExperimentConfig, ModelConfig, TPUConfig
        from or4d_tpu.data.vocab import DEFAULT_VOCAB
        from or4d_tpu.train.loop import Trainer

        import dataclasses

        cfg = ExperimentConfig(
            dataset=dataclasses.replace(TINY, data_augmentation=False),
            model=ModelConfig(sa_npoints=(16, 8), sa_nsamples=((4, 8), (8, 8))),
            tpu=TPUConfig(scene_batch=4, mesh_data=4, mesh_model=1, donate_state=False),
        )
        trainer = Trainer(cfg, DEFAULT_VOCAB, np.ones(12, np.float32), np.ones(15, np.float32))
        assert trainer.mesh.shape["dp"] == 4 and trainer.mesh.shape["mp"] == 1
        batch = make_scene_batch(4, seed=4, n_objects=4, ds=TINY, points_per_obj=150)
        state = trainer.init_state(jax.random.key(0), batch)

        # packed path (the Trainer builds the per-shard pack itself)
        pack = trainer._pack_for(batch)
        assert pack is not None and pack.obj_idx.ndim == 2

        key = jax.random.key(1)
        _, parts_packed, _ = trainer.train_step(state, batch, key)

        # unpacked: same state, same batch, pack disabled
        with trainer.mesh:
            from or4d_tpu.parallel.mesh import shard_batch

            _, parts_plain, _ = trainer._jitted("train")(state, shard_batch(batch, trainer.mesh), key, None)
        np.testing.assert_allclose(
            float(parts_packed["loss"]), float(parts_plain["loss"]), rtol=2e-4
        )

    def test_mp2_unpacked_loss_matches_dp4_packed(self, capsys):
        """mp>1 silently disables packing (slot axes are mp-sharded); the
        decision is now LOUD and, critically, numerically neutral: the same
        batch/state/key on a dp=2 x mp=2 mesh (unpacked) must produce the
        dp=4 packed loss."""
        from or4d_tpu.config import ExperimentConfig, ModelConfig, TPUConfig
        from or4d_tpu.data.vocab import DEFAULT_VOCAB
        from or4d_tpu.train.loop import Trainer

        import dataclasses

        # mp=2 shards the slot axes — they must divide the mesh
        ds_mp = DatasetConfig(num_points_objects=96, num_points_relation=128,
                              max_objects=6, max_edges=30, data_augmentation=False)
        base = dict(
            dataset=ds_mp,
            model=ModelConfig(sa_npoints=(16, 8), sa_nsamples=((4, 8), (8, 8))),
        )
        batch = make_scene_batch(4, seed=5, n_objects=4, ds=ds_mp, points_per_obj=150)
        key = jax.random.key(2)

        cfg_dp = ExperimentConfig(tpu=TPUConfig(scene_batch=4, mesh_data=4, mesh_model=1, donate_state=False), **base)
        tr_dp = Trainer(cfg_dp, DEFAULT_VOCAB, np.ones(12, np.float32), np.ones(15, np.float32))
        state_dp = tr_dp.init_state(jax.random.key(0), batch)
        assert tr_dp._pack_for(batch) is not None
        _, parts_dp, _ = tr_dp.train_step(state_dp, batch, key)

        cfg_mp = ExperimentConfig(tpu=TPUConfig(scene_batch=4, mesh_data=2, mesh_model=2, donate_state=False), **base)
        tr_mp = Trainer(cfg_mp, DEFAULT_VOCAB, np.ones(12, np.float32), np.ones(15, np.float32))
        assert tr_mp.mesh.shape["mp"] == 2
        state_mp = tr_mp.init_state(jax.random.key(0), batch)
        assert tr_mp._pack_for(batch) is None  # packing skipped, loudly
        assert "slot packing is disabled" in capsys.readouterr().out
        _, parts_mp, _ = tr_mp.train_step(state_mp, batch, key)

        np.testing.assert_allclose(float(parts_dp["loss"]), float(parts_mp["loss"]), rtol=2e-4)

