"""Serving-mode eval (precomputed SA1 geometry, or4d_tpu/serving.py):
the fast path must reproduce the cold path's outputs — the cache only moves
WHEN the weight-independent geometry work happens, never what is computed.
"""

import jax
import numpy as np

from or4d_tpu.config import DatasetConfig
from or4d_tpu.data.scene_batch import SlotPack
from or4d_tpu.data.synthetic import make_scene_batch
from or4d_tpu.models import SGPN
from or4d_tpu.serving import build_sgpn_sa1_caches
import pytest

# full-suite lane only: multi-minute on the 1-core runner (pytest.ini)
pytestmark = pytest.mark.slow

TINY = DatasetConfig(num_points_objects=96, num_points_relation=128,
                     max_objects=4, max_edges=12, data_augmentation=False)


def _tiny_model():
    return SGPN(num_classes=12, num_relations=15, sa_npoints=(32, 16),
                sa_nsamples=((4, 8), (8, 8)))


class TestServingParity:
    def test_cached_sa1_matches_cold_path(self):
        batch = make_scene_batch(2, seed=8, n_objects=4, ds=TINY, points_per_obj=150)
        model = _tiny_model()
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, train=False
        )
        pack = SlotPack.build(batch)
        caches = build_sgpn_sa1_caches(model, batch, pack)
        cold = model.apply(variables, batch, train=False, pack=pack)
        fast = model.apply(variables, batch, train=False, pack=pack, sa1_caches=caches)
        np.testing.assert_allclose(
            np.asarray(fast.rel_logprobs), np.asarray(cold.rel_logprobs), rtol=0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(fast.obj_logprobs), np.asarray(cold.obj_logprobs), rtol=0, atol=1e-5
        )

    def test_cached_sa1_matches_cold_path_no_pack(self):
        batch = make_scene_batch(1, seed=8, n_objects=4, ds=TINY, points_per_obj=150)
        model = _tiny_model()
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, train=False
        )
        caches = build_sgpn_sa1_caches(model, batch)
        cold = model.apply(variables, batch, train=False)
        fast = model.apply(variables, batch, train=False, sa1_caches=caches)
        np.testing.assert_allclose(
            np.asarray(fast.rel_logprobs), np.asarray(cold.rel_logprobs), rtol=0, atol=1e-5
        )

    def test_serving_evaluator_matches_trainer_evaluate(self):
        from or4d_tpu.config import ExperimentConfig, ModelConfig, TPUConfig
        from or4d_tpu.data.vocab import DEFAULT_VOCAB
        from or4d_tpu.serving import ServingEvaluator
        from or4d_tpu.train.loop import Trainer

        cfg = ExperimentConfig(
            dataset=TINY,
            model=ModelConfig(sa_npoints=(32, 16), sa_nsamples=((4, 8), (8, 8))),
            tpu=TPUConfig(scene_batch=2, donate_state=False, mesh_data=1, mesh_model=1),
        )
        trainer = Trainer(cfg, DEFAULT_VOCAB, np.ones(12, np.float32), np.ones(15, np.float32))
        batches = [make_scene_batch(2, seed=8, n_objects=4, ds=TINY, points_per_obj=150)]
        state = trainer.init_state(jax.random.key(0), batches[0])
        ev = ServingEvaluator(trainer, batches)
        f1_fast = ev.evaluate(state)
        f1_cold = trainer.evaluate(state, batches)
        assert abs(f1_fast - f1_cold) < 1e-9

    def test_serving_rejects_paired_and_train(self):
        import pytest

        batch = make_scene_batch(1, seed=8, n_objects=4, ds=TINY, points_per_obj=150,
                                 pair_shared=True)
        model = _tiny_model()
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, train=False
        )
        pack = SlotPack.build(batch, paired=True)
        with pytest.raises(ValueError, match="unpaired"):
            build_sgpn_sa1_caches(model, batch, pack)
        plain = SlotPack.build(batch)
        caches = build_sgpn_sa1_caches(model, batch, plain)
        with pytest.raises(ValueError, match="eval-only"):
            model.apply(variables, batch, train=True, pack=plain, sa1_caches=caches,
                        rngs={"dropout": jax.random.key(1)})


class TestShardedServing:
    def test_sharded_cache_matches_flat(self):
        """dp-sharded pack + caches must reproduce the flat serving logits
        (per-shard-local cache rows are a pure re-layout of the same crops)."""
        batch = make_scene_batch(4, seed=9, n_objects=4, ds=TINY, points_per_obj=150)
        model = _tiny_model()
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, train=False
        )
        flat_pack = SlotPack.build(batch)
        flat = model.apply(variables, batch, train=False, pack=flat_pack,
                           sa1_caches=build_sgpn_sa1_caches(model, batch, flat_pack))
        sh_pack = SlotPack.build(batch, shards=4)
        sharded = model.apply(variables, batch, train=False, pack=sh_pack,
                              sa1_caches=build_sgpn_sa1_caches(model, batch, sh_pack))
        em = np.asarray(batch.edge_mask)
        om = np.asarray(batch.obj_mask)
        np.testing.assert_allclose(
            np.asarray(flat.rel_logprobs)[em], np.asarray(sharded.rel_logprobs)[em], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(flat.obj_logprobs)[om], np.asarray(sharded.obj_logprobs)[om], atol=1e-5
        )

    def test_dp4_serving_evaluator_matches_flat(self):
        """ServingEvaluator on a dp=4 CPU mesh: same macro-F1 as the
        single-device evaluator, with batch/pack/cache rows sharded over dp."""
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
        f1_flat = ServingEvaluator(tr1, batches).evaluate(state)

        cfg4 = ExperimentConfig(
            tpu=TPUConfig(scene_batch=4, donate_state=False, mesh_data=4, mesh_model=1), **base
        )
        tr4 = Trainer(cfg4, DEFAULT_VOCAB, np.ones(12, np.float32), np.ones(15, np.float32))
        ev4 = ServingEvaluator(tr4, batches)
        assert ev4.mesh is not None and ev4.batches[0][1].obj_idx.ndim == 2
        assert abs(ev4.evaluate(state) - f1_flat) < 1e-6

    def test_mp_mesh_rejected(self):
        import pytest

        from or4d_tpu.config import ExperimentConfig, ModelConfig, TPUConfig
        from or4d_tpu.data.vocab import DEFAULT_VOCAB
        from or4d_tpu.serving import ServingEvaluator
        from or4d_tpu.train.loop import Trainer

        cfg = ExperimentConfig(
            dataset=TINY,
            model=ModelConfig(sa_npoints=(32, 16), sa_nsamples=((4, 8), (8, 8))),
            tpu=TPUConfig(scene_batch=4, donate_state=False, mesh_data=2, mesh_model=2),
        )
        tr = Trainer(cfg, DEFAULT_VOCAB, np.ones(12, np.float32), np.ones(15, np.float32))
        with pytest.raises(ValueError, match="dp-only"):
            ServingEvaluator(tr, [])


class TestServingVal:
    def test_fit_serving_val_matches_cold_val(self):
        """fit(serving_val=True): the per-epoch validation goes through a
        ServingEvaluator built once; with identical seeds/batches the
        training trajectory is unchanged, so val_macro_f1 must match the
        cold-path fit exactly."""
        from or4d_tpu.config import ExperimentConfig, ModelConfig, TPUConfig
        from or4d_tpu.data.vocab import DEFAULT_VOCAB
        from or4d_tpu.train.loop import Trainer

        cfg = ExperimentConfig(
            dataset=TINY,
            model=ModelConfig(sa_npoints=(32, 16), sa_nsamples=((4, 8), (8, 8))),
            tpu=TPUConfig(scene_batch=2, donate_state=False, mesh_data=1, mesh_model=1),
        )
        train_b = [make_scene_batch(2, seed=3, n_objects=4, ds=TINY, points_per_obj=150)]
        val_b = [make_scene_batch(2, seed=8, n_objects=4, ds=TINY, points_per_obj=150)]

        def run(serving_val):
            tr = Trainer(cfg, DEFAULT_VOCAB, np.ones(12, np.float32), np.ones(15, np.float32))
            state = tr.init_state(jax.random.key(0), train_b[0])
            _, hist = tr.fit(state, train_b, val_batches=val_b, epochs=1,
                             rng=jax.random.key(1), log_every=0, serving_val=serving_val)
            return hist[-1]["val_macro_f1"]

        assert abs(run(True) - run(False)) < 1e-9


class TestServingCLI:
    def test_evaluate_serving_cli(self, tmp_path, capsys):
        import json
        import shutil
        from pathlib import Path

        from or4d_tpu import cli

        root = tmp_path / "real_data"
        shutil.copytree(Path(__file__).parent / "golden" / "real_data", root)
        cfg = {
            "MAX_EPOCHES": 1, "LR": 1e-3, "USE_GT": True,
            "MODEL": {"sa_npoints": [32, 16], "sa_nsamples": [[4, 8], [8, 8]]},
            "dataset": {"num_points_objects": 96, "num_points_relation": 128,
                        "data_augmentation": False},
            "TPU": {"max_objects": 10, "max_edges": 90, "scene_batch": 2,
                    "donate_state": False},
        }
        cfg_path = tmp_path / "tiny_serving.json"
        cfg_path.write_text(json.dumps(cfg))
        assert cli.main([
            "evaluate", "--config", str(cfg_path), "--data-root", str(root),
            "--split", "train", "--cache-dir", str(tmp_path / "cache"), "--serving",
        ]) == 0
        out = capsys.readouterr().out
        rec = json.loads(out.strip().splitlines()[-1])
        assert rec["split"] == "train" and 0.0 <= rec["relation_macro_f1"] <= 1.0

    def test_serving_evaluator_offload_matches_resident(self):
        from or4d_tpu.config import ExperimentConfig, ModelConfig, TPUConfig
        from or4d_tpu.data.vocab import DEFAULT_VOCAB
        from or4d_tpu.serving import ServingEvaluator
        from or4d_tpu.train.loop import Trainer

        cfg = ExperimentConfig(
            dataset=TINY,
            model=ModelConfig(sa_npoints=(32, 16), sa_nsamples=((4, 8), (8, 8))),
            tpu=TPUConfig(scene_batch=2, donate_state=False, mesh_data=1, mesh_model=1),
        )
        trainer = Trainer(cfg, DEFAULT_VOCAB, np.ones(12, np.float32), np.ones(15, np.float32))
        batches = [make_scene_batch(2, seed=8, n_objects=4, ds=TINY, points_per_obj=150)]
        state = trainer.init_state(jax.random.key(0), batches[0])
        resident = ServingEvaluator(trainer, batches, offload=False)
        offloaded = ServingEvaluator(trainer, batches, offload=True)
        assert offloaded.batches[0][3] and not resident.batches[0][3]
        assert abs(resident.evaluate(state) - offloaded.evaluate(state)) < 1e-9

    def test_persisted_cache_roundtrip(self, tmp_path, monkeypatch):
        """cache_dir: the first evaluator persists content-keyed npz caches
        (bf16 planes round-trip through uint16 views); a second construction
        LOADS them — the geometry build never runs — and evaluates to the
        same macro-F1."""
        from or4d_tpu import serving as srv
        from or4d_tpu.config import ExperimentConfig, ModelConfig, TPUConfig
        from or4d_tpu.data.vocab import DEFAULT_VOCAB
        from or4d_tpu.serving import ServingEvaluator
        from or4d_tpu.train.loop import Trainer

        cfg = ExperimentConfig(
            dataset=TINY,
            model=ModelConfig(sa_npoints=(32, 16), sa_nsamples=((4, 8), (8, 8))),
            tpu=TPUConfig(scene_batch=2, donate_state=False, mesh_data=1, mesh_model=1),
        )
        trainer = Trainer(cfg, DEFAULT_VOCAB, np.ones(12, np.float32), np.ones(15, np.float32))
        batches = [make_scene_batch(2, seed=8, n_objects=4, ds=TINY, points_per_obj=150)]
        state = trainer.init_state(jax.random.key(0), batches[0])
        f1_first = ServingEvaluator(trainer, batches, cache_dir=tmp_path).evaluate(state)
        files = sorted(tmp_path.glob("sa1_*.npz"))
        assert len(files) == 1

        calls = []
        orig = srv.build_sgpn_sa1_caches
        monkeypatch.setattr(srv, "build_sgpn_sa1_caches",
                            lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
        f1_loaded = ServingEvaluator(trainer, batches, cache_dir=tmp_path).evaluate(state)
        assert calls == []  # loaded from disk, never rebuilt
        assert abs(f1_loaded - f1_first) < 1e-9

        # bf16 planes round-trip bit-exactly through the uint16 view
        import jax.numpy as jnp

        from or4d_tpu.serving import SA1Cache, _load_caches, _save_caches

        bf = np.asarray(jnp.arange(24, dtype=jnp.float32).reshape(1, 2, 3, 4).astype(jnp.bfloat16))
        c = SA1Cache(new_xyz=np.zeros((1, 2, 3), np.float32), grouped=(bf,))
        _save_caches(tmp_path / "bf16.npz", (c, c))
        o, _r = _load_caches(tmp_path / "bf16.npz")
        assert str(o.grouped[0].dtype) == "bfloat16"
        np.testing.assert_array_equal(o.grouped[0].view(np.uint16), bf.view(np.uint16))

        # the content key must discriminate anything that changes cache rows:
        # shard count, validity masks, scan identity (a stale hit would
        # silently serve wrong geometry)
        import dataclasses as dc

        from or4d_tpu.serving import _cache_key

        b = batches[0]
        k = _cache_key(b, 1, trainer.model, np.float32)
        assert _cache_key(b, 2, trainer.model, np.float32) != k
        em = np.asarray(b.edge_mask).copy()
        em[0, 0] = ~em[0, 0]
        assert _cache_key(dc.replace(b, edge_mask=em), 1, trainer.model, np.float32) != k
        assert _cache_key(
            dc.replace(b, scan_ids=("x",) + tuple(b.scan_ids[1:])), 1, trainer.model, np.float32
        ) != k
        assert _cache_key(b, 1, trainer.model, np.float32) == k  # deterministic

    def test_auto_offload_mid_build_and_stripped_batches(self):
        """HBM lifecycle: (a) auto offload fires INSIDE the build loop (peak
        residency stays bounded while building a split whose caches exceed
        the budget), and (b) the stored batches carry 1-point stand-ins for
        the raw crops the serving path never reads — at paper shapes the
        crops are ~2 GB/batch, far larger than the caches themselves."""
        from or4d_tpu.config import ExperimentConfig, ModelConfig, TPUConfig
        from or4d_tpu.data.vocab import DEFAULT_VOCAB
        from or4d_tpu.serving import ServingEvaluator
        from or4d_tpu.train.loop import Trainer

        cfg = ExperimentConfig(
            dataset=TINY,
            model=ModelConfig(sa_npoints=(32, 16), sa_nsamples=((4, 8), (8, 8))),
            tpu=TPUConfig(scene_batch=2, donate_state=False, mesh_data=1, mesh_model=1),
        )
        trainer = Trainer(cfg, DEFAULT_VOCAB, np.ones(12, np.float32), np.ones(15, np.float32))
        batches = [make_scene_batch(2, seed=s, n_objects=4, ds=TINY, points_per_obj=150)
                   for s in (8, 9)]
        state = trainer.init_state(jax.random.key(0), batches[0])
        ev = ServingEvaluator(trainer, batches, offload="auto", device_budget_bytes=1)
        assert all(entry[3] for entry in ev.batches)  # every cache host-resident
        for entry in ev.batches:
            assert entry[0].obj_points.shape[2] == 1
            assert entry[0].rel_points.shape[2] == 1
        f1_cold = trainer.evaluate(state, batches)
        assert abs(ev.evaluate(state) - f1_cold) < 1e-9
