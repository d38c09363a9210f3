"""PLY reading + registered-object-scan loading."""

import numpy as np
import pytest

from or4d_tpu.data.pcd_io import load_registered_object_scan, read_ply


def _write_ply(path, pts, binary=True, rgb=True):
    n = len(pts)
    props = ["property float x", "property float y", "property float z"]
    if rgb:
        props += ["property uchar red", "property uchar green", "property uchar blue"]
    header = (
        "ply\nformat {} 1.0\nelement vertex {}\n{}\nend_header\n".format(
            "binary_little_endian" if binary else "ascii", n, "\n".join(props)
        )
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        if binary:
            dt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4")] + ([("r", "u1"), ("g", "u1"), ("b", "u1")] if rgb else []))
            rec = np.zeros(n, dt)
            for i, c in enumerate("xyz"):
                rec[c] = pts[:, i]
            if rgb:
                for i, c in enumerate("rgb"):
                    rec[c] = (pts[:, 3 + i] * 255).astype(np.uint8)
            f.write(rec.tobytes())
        else:
            for row in pts:
                cols = list(row[:3]) + ([int(v * 255) for v in row[3:6]] if rgb else [])
                f.write((" ".join(str(c) for c in cols) + "\n").encode())


class TestPLY:
    def test_binary_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        pts = np.concatenate([rng.standard_normal((40, 3)), rng.random((40, 3))], axis=1).astype(np.float32)
        p = tmp_path / "a.ply"
        _write_ply(p, pts, binary=True)
        got = read_ply(p)
        np.testing.assert_allclose(got[:, :3], pts[:, :3], atol=1e-6)
        np.testing.assert_allclose(got[:, 3:], pts[:, 3:], atol=1 / 255 + 1e-6)

    def test_ascii_no_rgb(self, tmp_path):
        pts = np.arange(12, dtype=np.float32).reshape(4, 3)
        pts6 = np.concatenate([pts, np.zeros((4, 3), np.float32)], axis=1)
        p = tmp_path / "b.ply"
        _write_ply(p, pts6, binary=False, rgb=False)
        got = read_ply(p)
        np.testing.assert_allclose(got[:, :3], pts, atol=1e-5)

    def test_registered_scan_transform(self, tmp_path):
        pts = np.zeros((3, 6), np.float32)
        pts[:, 0] = [0, 1, 2]
        p = tmp_path / "c.ply"
        _write_ply(p, pts, binary=True)
        t = np.eye(4)
        t[:3, 3] = [1.0, 0.0, 0.0]  # translation in depth units -> *2000
        out = load_registered_object_scan(p, t)
        np.testing.assert_allclose(out[:, 0], [2000, 2001, 2002], atol=1e-3)
