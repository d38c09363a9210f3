"""Coverage for less-traveled paths: chunked XLA ball query, dataset caching,
metrics logger, SlotPack bucketing edge cases."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

# ops/__init__ re-exports the ball_query FUNCTION under the submodule's name,
# so `import ... as` would resolve to the function; go through sys.modules
import importlib

bq_mod = importlib.import_module("or4d_tpu.ops.ball_query")
from or4d_tpu.config import TINY as TINY_CFG
from or4d_tpu.data.dataset import ORDataset
from or4d_tpu.data.vocab import DEFAULT_VOCAB
from or4d_tpu.utils.logging import MetricsLogger


class TestChunkedBallQuery:
    def test_chunked_matches_unchunked(self, monkeypatch):
        rng = np.random.default_rng(0)
        xyz = jnp.asarray((rng.standard_normal((9, 300, 3)) * 0.5).astype(np.float32))
        new_xyz = xyz[:, :40, :]
        want = np.asarray(bq_mod._ball_query_block(0.4, 6, xyz, new_xyz))
        # force tiny chunks so the lax.map path runs with padding (9 -> 10)
        monkeypatch.setattr(bq_mod, "_CHUNK_ELEMS", 300 * 40 * 2)
        got = np.asarray(bq_mod.ball_query.__wrapped__(0.4, 6, xyz, new_xyz))
        np.testing.assert_array_equal(got, want)


class TestDatasetCaching:
    def test_sample_cache_roundtrip(self, tmp_path):
        ds = ORDataset(TINY_CFG, "val", DEFAULT_VOCAB, data_root=tmp_path / "nodata",
                       cache_dir=tmp_path / "cache", synthetic_scans_per_take=2)
        s1 = ds.sample(0)
        # cache_dir is a BASE dir; the config-dependent suffix subdir keeps
        # gt/no-gt/eval variants separate
        assert (ds.cache_dir / f"{s1.scan_id}.npz").exists()
        assert str(ds.cache_dir).startswith(str(tmp_path / "cache"))
        s2 = ds.sample(0)  # cache hit
        np.testing.assert_array_equal(s1.obj_points, s2.obj_points)
        np.testing.assert_array_equal(s1.gt_rels, s2.gt_rels)
        assert s1.slot_names == s2.slot_names

    def test_batches_cover_all_scans(self, tmp_path):
        ds = ORDataset(TINY_CFG, "val", DEFAULT_VOCAB, data_root=tmp_path / "nodata",
                       cache_dir=tmp_path / "cache2", synthetic_scans_per_take=3)
        seen = []
        for b in ds.batches(4):
            seen.extend(b.scan_ids)
        assert len(seen) == len(ds)
        assert len(set(seen)) == len(seen)

    def test_weights_from_synthetic_scans(self, tmp_path):
        ds = ORDataset(TINY_CFG, "val", DEFAULT_VOCAB, data_root=tmp_path / "nodata",
                       cache_dir=tmp_path / "cache3", synthetic_scans_per_take=2)
        w_obj, w_rel = ds.weights()
        assert w_obj.shape == (12,) and w_rel.shape == (15,)
        assert w_rel[DEFAULT_VOCAB.none_index] == np.float32(1e-4)


class TestMetricsLogger:
    def test_jsonl_stream(self, tmp_path):
        lg = MetricsLogger(tmp_path, name="m")
        lg.log(0, loss=1.5, split="train")
        lg.log(1, loss=np.float32(1.2))
        lg.log_report("rep", 1, "hello report")
        lg.close()
        lines = [json.loads(l) for l in (tmp_path / "m.jsonl").read_text().splitlines()]
        assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 0
        assert lines[1]["loss"] == pytest.approx(1.2)
        assert (tmp_path / "rep_step1.txt").read_text() == "hello report"


class TestSlotPackBuckets:
    def test_capacity_clamped_to_total(self):
        from or4d_tpu.data.scene_batch import SlotPack
        from or4d_tpu.data.synthetic import make_scene_batch
        from or4d_tpu.config import DatasetConfig

        tiny = DatasetConfig(num_points_objects=64, num_points_relation=96, max_objects=4, max_edges=12)
        b = make_scene_batch(1, seed=0, n_objects=4, ds=tiny, points_per_obj=150)
        pack = SlotPack.build(b, bucket=4096)  # bucket larger than total slots
        assert len(pack.edge_idx) == 12  # clamped to S*E
        assert pack.edge_valid.sum() == 12
