"""PCD point-cloud IO + native ingest bindings.

The reference reads scans with open3d (`o3d.io.read_point_cloud`,
dataset_utils.py:70) and voxel-downsamples with
`voxel_down_sample_and_trace` (data_preparation_utils.py:37-49). Here the
host-side hot loops live in the native C++ runtime
(native/or4d_ingest.cpp — PCD v0.7 ascii/binary/binary_compressed with LZF,
voxel-grid selection, fused union-crop), bound through ctypes with a pure-
numpy fallback so the package works before `make -C native`.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libor4d_ingest.so"
_lib = None


def _load_native(build: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and build and (_NATIVE_DIR / "Makefile").exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True)
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.or4d_read_pcd.restype = ctypes.c_long
    lib.or4d_read_pcd.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_long]
    lib.or4d_voxel_downsample.restype = ctypes.c_long
    lib.or4d_voxel_downsample.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_float, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.or4d_downsample_sweep.restype = ctypes.c_long
    lib.or4d_downsample_sweep.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.or4d_lzf_decompress.restype = ctypes.c_long
    lib.or4d_lzf_decompress.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long]
    lib.or4d_crop_union.restype = ctypes.c_long
    lib.or4d_crop_union.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_native() is not None


def read_pcd(path: str | Path) -> np.ndarray:
    """Read a PCD file -> (N, 6) float32 [xyz, rgb in 0..1]."""
    lib = _load_native()
    path = str(path)
    if lib is not None:
        n = lib.or4d_read_pcd(path.encode(), None, 0)
        if n < 0:
            raise IOError(f"failed to parse PCD header: {path}")
        out = np.empty((n, 6), np.float32)
        got = lib.or4d_read_pcd(path.encode(), out.ctypes.data_as(ctypes.c_void_p), n)
        if got != n:
            raise IOError(f"failed to read PCD body: {path} ({got}/{n})")
        return out
    return _read_pcd_numpy(path)


def voxel_downsample_indices_native(xyz: np.ndarray, voxel_size: float, max_per_voxel: int = 8) -> np.ndarray:
    """Native voxel-grid selection; falls back to the numpy implementation
    in :mod:`or4d_tpu.data.prep`."""
    lib = _load_native()
    xyz = np.ascontiguousarray(xyz[:, :3], np.float32)
    if lib is not None:
        out = np.empty(len(xyz), np.int64)
        k = lib.or4d_voxel_downsample(
            xyz.ctypes.data_as(ctypes.c_void_p), len(xyz), ctypes.c_float(voxel_size), max_per_voxel,
            out.ctypes.data_as(ctypes.c_void_p),
        )
        return out[:k]
    from or4d_tpu.data.prep import voxel_downsample_indices

    return voxel_downsample_indices(xyz, voxel_size)


def downsample_sweep_native(xyz: np.ndarray, target: int, max_per_voxel: int = 8) -> np.ndarray | None:
    """The reference's voxel sweep in native code (before the random final
    subset); returns candidate indices (> target count, or all), or None when
    the native library is unavailable / the grid degenerates."""
    lib = _load_native()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz[:, :3], np.float32)
    out = np.empty(len(xyz), np.int64)
    k = lib.or4d_downsample_sweep(
        xyz.ctypes.data_as(ctypes.c_void_p), len(xyz), target, max_per_voxel,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out[:k] if k >= 0 else None


def crop_union_native(
    xyz: np.ndarray, labels: np.ndarray, mn: np.ndarray, mx: np.ndarray, sub: int, obj: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """Fused edge-crop: indices of points strictly inside [mn, mx] plus their
    subject(1)/object(2)/other(0) mask channel, in one native pass. None when
    the library is unavailable."""
    lib = _load_native()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz[:, :3], np.float32)
    labels = np.ascontiguousarray(labels, np.int32)
    mn = np.ascontiguousarray(mn, np.float32)
    mx = np.ascontiguousarray(mx, np.float32)
    idx = np.empty(len(xyz), np.int64)
    mask = np.empty(len(xyz), np.float32)
    k = lib.or4d_crop_union(
        xyz.ctypes.data_as(ctypes.c_void_p), labels.ctypes.data_as(ctypes.c_void_p), len(xyz),
        mn.ctypes.data_as(ctypes.c_void_p), mx.ctypes.data_as(ctypes.c_void_p),
        int(sub), int(obj), idx.ctypes.data_as(ctypes.c_void_p), mask.ctypes.data_as(ctypes.c_void_p),
    )
    return idx[:k], mask[:k]


# ---------------------------------------------------------------------------
# numpy fallback PCD reader (ascii/binary; binary_compressed needs native LZF)
# ---------------------------------------------------------------------------

def _read_pcd_numpy(path: str) -> np.ndarray:
    header: dict[str, list[str]] = {}
    with open(path, "rb") as f:
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if not line:
                raise IOError(f"unexpected EOF in header: {path}")
            key, *vals = line.split()
            header[key] = vals
            if key == "DATA":
                break
        fields = header["FIELDS"]
        sizes = [int(s) for s in header["SIZE"]]
        types = header["TYPE"]
        n = int(header["POINTS"][0])
        mode = header["DATA"][0]

        np_types = {("F", 4): "f4", ("F", 8): "f8", ("U", 1): "u1", ("U", 2): "u2", ("U", 4): "u4", ("I", 1): "i1", ("I", 2): "i2", ("I", 4): "i4"}
        dtype = np.dtype([(name, np_types[(t, s)]) for name, t, s in zip(fields, types, sizes)])
        if mode == "ascii":
            rows = np.loadtxt(f, max_rows=n)
            rec = np.rec.fromarrays(rows.T, dtype=dtype) if rows.ndim == 2 else rows.view(dtype)
        elif mode == "binary":
            rec = np.frombuffer(f.read(dtype.itemsize * n), dtype=dtype, count=n)
        else:
            raise IOError(f"binary_compressed PCD requires the native ingest library: {path}")

    out = np.zeros((n, 6), np.float32)
    out[:, 0] = np.asarray(rec["x"], np.float32)
    out[:, 1] = np.asarray(rec["y"], np.float32)
    out[:, 2] = np.asarray(rec["z"], np.float32)
    if "rgb" in fields:
        packed = np.asarray(rec["rgb"], np.float32).view(np.uint32)
        out[:, 3] = ((packed >> 16) & 0xFF) / 255.0
        out[:, 4] = ((packed >> 8) & 0xFF) / 255.0
        out[:, 5] = (packed & 0xFF) / 255.0
    elif all(c in fields for c in "rgb"):
        for i, c in enumerate("rgb"):
            out[:, 3 + i] = np.asarray(rec[c], np.float32) / 255.0
    return out


def read_ply(path: str | Path) -> np.ndarray:
    """Read a PLY point cloud -> (N, 6) float32 [xyz, rgb in 0..1].

    The reference loads registered object scans (`object_scans/*/*.ply`)
    through open3d (helpers/object_pose_utils.py:9-26); this covers ascii and
    binary_little_endian vertex elements with x/y/z (+ red/green/blue).
    """
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise IOError(f"not a PLY file: {path}")
        fmt = None
        n = 0
        props: list[tuple[str, str]] = []
        in_vertex = False
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, cnt = line.split()
                in_vertex = name == "vertex"
                if in_vertex:
                    n = int(cnt)
            elif line.startswith("property") and in_vertex:
                _, typ, name = line.split()
                props.append((name, typ))
            elif line == "end_header":
                break

        type_map = {
            "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
            "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
            "short": "i2", "ushort": "u2", "int": "i4", "int32": "i4", "uint": "u4",
        }
        dtype = np.dtype([(name, "<" + type_map[typ]) for name, typ in props])
        if fmt == "ascii":
            rows = np.loadtxt(f, max_rows=n, ndmin=2)
            rec = np.rec.fromarrays(rows.T, dtype=dtype)
        elif fmt == "binary_little_endian":
            rec = np.frombuffer(f.read(dtype.itemsize * n), dtype=dtype, count=n)
        else:
            raise IOError(f"unsupported PLY format {fmt}: {path}")

    out = np.zeros((n, 6), np.float32)
    for i, c in enumerate("xyz"):
        out[:, i] = np.asarray(rec[c], np.float32)
    names = [p[0] for p in props]
    if all(c in names for c in ("red", "green", "blue")):
        for i, c in enumerate(("red", "green", "blue")):
            v = np.asarray(rec[c], np.float32)
            out[:, 3 + i] = v / 255.0 if v.max(initial=0) > 1.0 else v
    return out


def load_registered_object_scan(ply_path: str | Path, transformation: np.ndarray) -> np.ndarray:
    """get_object_poses for one scan (object_pose_utils.py:9-26): load the
    .ply, scale the transform's translation by DEPTH_SCALING, apply it."""
    from or4d_tpu.data.cameras import scale_registered_translation

    pts = read_ply(ply_path)
    t = scale_registered_translation(transformation)
    xyz1 = np.concatenate([pts[:, :3], np.ones((len(pts), 1))], axis=1)
    pts = pts.copy()
    pts[:, :3] = (xyz1 @ t.T)[:, :3]
    return pts


def write_pcd(path: str | Path, points: np.ndarray, binary: bool = True) -> None:
    """Write (N, 6) [xyz rgb01] as PCD v0.7 with a packed-float rgb field."""
    points = np.asarray(points, np.float32)
    n = len(points)
    rgb = (
        (np.clip(points[:, 3] * 255, 0, 255).astype(np.uint32) << 16)
        | (np.clip(points[:, 4] * 255, 0, 255).astype(np.uint32) << 8)
        | np.clip(points[:, 5] * 255, 0, 255).astype(np.uint32)
    ).view(np.float32) if points.shape[1] >= 6 else None
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
        f"FIELDS x y z{' rgb' if rgb is not None else ''}\n"
        f"SIZE 4 4 4{' 4' if rgb is not None else ''}\n"
        f"TYPE F F F{' F' if rgb is not None else ''}\n"
        f"COUNT 1 1 1{' 1' if rgb is not None else ''}\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n"
        f"DATA {'binary' if binary else 'ascii'}\n"
    )
    cols = [points[:, 0], points[:, 1], points[:, 2]] + ([rgb] if rgb is not None else [])
    body = np.stack(cols, axis=1).astype(np.float32)
    with open(path, "wb") as f:
        f.write(header.encode())
        if binary:
            f.write(body.tobytes())
        else:
            np.savetxt(f, body, fmt="%.6f")
