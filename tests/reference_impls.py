"""Plain-numpy oracles mirroring the reference CUDA/Cython semantics.

These re-state the observable behaviour of the reference kernels
(/root/reference/.../_ext-src/src/*.cu, role_prediction/graphormer/algos.pyx)
as slow, obviously-correct Python so the TPU ops can be tested for parity.
"""

from __future__ import annotations

import numpy as np


def fps_np(xyz: np.ndarray, npoint: int) -> np.ndarray:
    """Sequential FPS with the reference's start-at-0 and mag<=1e-3 skip."""
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int32)
    for b in range(B):
        pts = xyz[b].astype(np.float64)
        mag = np.sum(pts * pts, axis=1)
        valid = mag > 1e-3
        mind = np.full(N, np.inf)
        old = 0
        for j in range(1, npoint):
            d = np.sum((pts - pts[old]) ** 2, axis=1)
            mind = np.minimum(mind, d)
            masked = np.where(valid, mind, -1.0)
            old = int(np.argmax(masked))
            out[b, j] = old
    return out


def ball_query_np(radius: float, nsample: int, xyz: np.ndarray, new_xyz: np.ndarray) -> np.ndarray:
    """Scan-order ball query with first-hit slot pre-fill (ball_query_gpu.cu:9-44)."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    r2 = radius * radius
    out = np.zeros((B, M, nsample), dtype=np.int32)
    for b in range(B):
        for j in range(M):
            cnt = 0
            for k in range(N):
                d2 = np.sum((new_xyz[b, j] - xyz[b, k]) ** 2)
                if d2 < r2:
                    if cnt == 0:
                        out[b, j, :] = k
                    out[b, j, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return out


def three_nn_np(unknown: np.ndarray, known: np.ndarray):
    B, n, _ = unknown.shape
    dist = np.zeros((B, n, 3))
    idx = np.zeros((B, n, 3), dtype=np.int32)
    for b in range(B):
        d2 = np.sum((unknown[b][:, None, :] - known[b][None, :, :]) ** 2, axis=-1)
        order = np.argsort(d2, axis=1)[:, :3]
        idx[b] = order
        dist[b] = np.sqrt(np.take_along_axis(d2, order, axis=1))
    return dist, idx


def floyd_warshall_np(adj: np.ndarray, max_dist: int = 12):
    """Exact re-statement of algos.pyx:11-55 (path=last improving pivot)."""
    n = adj.shape[0]
    M = adj.astype(np.int64).copy()
    path = np.zeros((n, n), dtype=np.int64)
    for i in range(n):
        for j in range(n):
            if i == j:
                M[i, j] = 0
            elif M[i, j] == 0:
                M[i, j] = max_dist
    for k in range(n):
        for i in range(n):
            for j in range(n):
                if M[i, j] > M[i, k] + M[k, j]:
                    M[i, j] = M[i, k] + M[k, j]
                    path[i, j] = k
    for i in range(n):
        for j in range(n):
            if M[i, j] >= max_dist:
                M[i, j] = max_dist
                path[i, j] = max_dist
    return M, path
