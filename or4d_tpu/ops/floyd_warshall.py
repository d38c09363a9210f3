"""All-pairs shortest paths + multi-hop edge-feature construction.

TPU-native replacement for the reference Cython module
(`role_prediction/graphormer/algos.pyx:11-89`), with exact reference
semantics:

  * MAX_DIST = 12; diagonal 0; missing edges initialized to 12;
  * pivot matrix ``path`` initialized to 0 and updated to the LAST pivot k
    that strictly improved a pair;
  * after the sweep, pairs with distance >= 12 are clamped to 12 in both
    matrices (12 in ``path`` marks "unreachable");
  * path reconstruction treats pivot 0 as "direct edge" (a faithful quirk of
    the reference: node 0 can never be reported as an intermediate);
  * ``gen_edge_input`` fills unwritten entries with -1.

Graphs are tiny (<= 64 nodes), so the O(n³) FW is a `fori_loop` of vectorized
(n, n) min-plus updates; ``gen_edge_input`` is host-side numpy run once per
sample at dataset-build time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MAX_DIST = 12  # reference: algos.pyx:9


@jax.jit
def floyd_warshall(adj: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Shortest path lengths and last-improving-pivot matrix.

    ``adj``: (n, n) bool/int adjacency (nonzero = edge of cost adj[i, j],
    zero = no edge). Returns (M, path), both (n, n) int32.
    """
    n = adj.shape[0]
    adj = adj.astype(jnp.int32)
    big = jnp.int32(MAX_DIST)
    M = jnp.where(adj != 0, adj, big)
    M = jnp.where(jnp.eye(n, dtype=bool), jnp.int32(0), M)
    path = jnp.zeros((n, n), dtype=jnp.int32)

    def body(k, carry):
        M, path = carry
        cand = M[:, k][:, None] + M[k, :][None, :]
        better = cand < M
        return jnp.where(better, cand, M), jnp.where(better, jnp.int32(k), path)

    M, path = jax.lax.fori_loop(0, n, body, (M, path))
    unreachable = M >= MAX_DIST
    M = jnp.where(unreachable, big, M)
    path = jnp.where(unreachable, big, path)
    return M, path


def get_all_edges(path: np.ndarray, i: int, j: int) -> list[int]:
    """Reference-compatible path reconstruction (algos.pyx:57-62).

    Returns the intermediate pivots on the shortest i->j path; pivot 0
    terminates the recursion (faithful reference quirk).
    """
    path = np.asarray(path)
    k = int(path[i][j])
    if k == 0:
        return []
    return get_all_edges(path, i, k) + [k] + get_all_edges(path, k, j)


def gen_edge_input(max_dist: int, path: np.ndarray, edge_feat: np.ndarray) -> np.ndarray:
    """Multi-hop edge features along shortest paths (algos.pyx:64-89).

    ``path``: (n, n) pivot matrix from :func:`floyd_warshall`.
    ``edge_feat``: (n, n, F) integer per-edge features.
    Returns (n, n, max_dist, F) int64, -1-filled, where entry [i, j, d] is the
    feature of the d-th edge on the reconstructed i->j path.
    """
    path = np.asarray(path)
    edge_feat = np.asarray(edge_feat, dtype=np.int64)
    n = path.shape[0]
    F = edge_feat.shape[-1]
    out = -np.ones((n, n, int(max_dist), F), dtype=np.int64)
    for i in range(n):
        for j in range(n):
            if i == j or path[i][j] == MAX_DIST:
                continue
            hops = [i] + get_all_edges(path, i, j) + [j]
            for d in range(min(len(hops) - 1, int(max_dist))):
                out[i, j, d] = edge_feat[hops[d], hops[d + 1]]
    return out
