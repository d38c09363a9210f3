"""Slot packing: packed and unpacked forwards must agree on valid slots."""

import numpy as np
import jax
import jax.numpy as jnp

from or4d_tpu.config import DatasetConfig
from or4d_tpu.data.scene_batch import SlotPack
from or4d_tpu.data.synthetic import make_scene_batch
from or4d_tpu.models import SGPN

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
