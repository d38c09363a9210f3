"""Native ingest tests: build the C++ library, round-trip PCD binary/ascii,
LZF codec, voxel downsample parity with the numpy re-spec."""

import ctypes

import numpy as np
import pytest

from or4d_tpu.data import pcd_io
from or4d_tpu.data.prep import voxel_downsample_indices


@pytest.fixture(scope="module")
def native():
    lib = pcd_io._load_native()
    if lib is None:
        pytest.skip("native ingest library failed to build")
    return lib


def _cloud(n=500, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.concatenate(
        [rng.uniform(-100, 100, size=(n, 3)), rng.uniform(0, 1, size=(n, 3))], axis=1
    ).astype(np.float32)
    return pts


class TestPCD:
    def test_binary_roundtrip_native(self, native, tmp_path):
        pts = _cloud()
        p = tmp_path / "t.pcd"
        pcd_io.write_pcd(p, pts, binary=True)
        got = pcd_io.read_pcd(p)
        np.testing.assert_allclose(got[:, :3], pts[:, :3], atol=1e-6)
        np.testing.assert_allclose(got[:, 3:], pts[:, 3:], atol=1 / 255 + 1e-6)

    def test_ascii_roundtrip(self, native, tmp_path):
        pts = _cloud(50, 1)
        p = tmp_path / "a.pcd"
        pcd_io.write_pcd(p, pts, binary=False)
        got = pcd_io.read_pcd(p)
        np.testing.assert_allclose(got[:, :3], pts[:, :3], atol=1e-4)

    def test_numpy_fallback_matches_native(self, native, tmp_path):
        pts = _cloud(80, 2)
        p = tmp_path / "b.pcd"
        pcd_io.write_pcd(p, pts, binary=True)
        got_np = pcd_io._read_pcd_numpy(str(p))
        got_native = pcd_io.read_pcd(p)
        np.testing.assert_allclose(got_np, got_native, atol=1e-6)


class TestLZF:
    def test_roundtrip_against_reference_compressor(self, native):
        # hand-roll a tiny LZF stream: literal run + back reference
        data = b"abcabcabcabcXYZ" * 20
        # compress naively: emit everything as literal runs (valid LZF)
        comp = bytearray()
        i = 0
        while i < len(data):
            chunk = data[i : i + 32]
            comp.append(len(chunk) - 1)
            comp.extend(chunk)
            i += len(chunk)
        out = np.zeros(len(data) + 16, np.uint8)
        n = native.or4d_lzf_decompress(
            bytes(comp), len(comp), out.ctypes.data_as(ctypes.c_void_p), len(out)
        )
        assert n == len(data)
        assert bytes(out[:n]) == data

    def test_backref_decoding(self, native):
        # literal "abc" then back-reference len=3 offset=3 -> "abcabc"
        # ctrl byte: len-2=1 in high 3 bits, offset-1=2 -> ctrl=(1<<5)|0, low byte 2
        stream = bytes([0x02, ord("a"), ord("b"), ord("c"), (1 << 5) | 0, 2])
        out = np.zeros(16, np.uint8)
        n = native.or4d_lzf_decompress(stream, len(stream), out.ctypes.data_as(ctypes.c_void_p), 16)
        assert n == 6
        assert bytes(out[:6]) == b"abcabc"


class TestVoxelDownsample:
    def test_native_counts_reasonable(self, native):
        pts = _cloud(2000, 3)
        idx = pcd_io.voxel_downsample_indices_native(pts, 50.0)
        assert 0 < len(idx) <= 2000
        assert (np.diff(idx) > 0).all()  # sorted unique

    def test_matches_numpy_exactly(self, native):
        # the native key is the same collision-free mixed-radix voxel key as
        # the numpy twin, so selections are identical
        for seed, vs in [(4, 40.0), (11, 15.0), (12, 95.0)]:
            pts = _cloud(3000, seed)
            got = pcd_io.voxel_downsample_indices_native(pts, vs)
            want = voxel_downsample_indices(pts[:, :3], vs)
            np.testing.assert_array_equal(got, want)

    def test_sweep(self, native):
        pts = _cloud(5000, 5)
        idx = pcd_io.downsample_sweep_native(pts, 300)
        assert len(idx) >= 300 or len(idx) == 5000

    def test_sweep_matches_numpy_prep(self, native):
        from or4d_tpu.data.prep import _MAX_PER_VOXEL, _VOXEL_SWEEP

        pts = _cloud(5000, 6)
        got = pcd_io.downsample_sweep_native(pts, 300)
        want = np.arange(len(pts))
        for size in _VOXEL_SWEEP:
            choice = voxel_downsample_indices(pts[:, :3], float(size))
            if len(choice) > 300:
                want = choice
            else:
                break
        np.testing.assert_array_equal(got, want)


class TestCropUnion:
    def test_matches_numpy(self, native):
        rng = np.random.default_rng(9)
        pts = rng.uniform(-100, 100, (4000, 3)).astype(np.float32)
        labels = rng.integers(0, 5, 4000).astype(np.int32)
        mn = np.array([-40.0, -40.0, -40.0], np.float32)
        mx = np.array([55.0, 60.0, 30.0], np.float32)
        idx, mask = pcd_io.crop_union_native(pts, labels, mn, mx, sub=2, obj=4)
        inside = np.all((pts > mn) & (pts < mx), axis=1)
        want_mask = (labels == 2).astype(np.float32) * 1.0 + (labels == 4).astype(np.float32) * 2.0
        np.testing.assert_array_equal(idx, np.flatnonzero(inside))
        np.testing.assert_array_equal(mask, want_mask[inside])
