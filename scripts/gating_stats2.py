"""Round-5 host-side modeling: Morton chunk-LIST gating vs the two-gate kernel.

The round-4 model applied Morton windows (contiguous chunk RANGES hi_m-lo_m)
and found no win at 32-row granularity. This models chunk LISTS instead: the
set of 512-point Morton-sorted chunks whose AABB is within radius of any row
in the tile (what a kernel with a dynamic chunk work-list can scan), plus a
population decomposition of where the current two-gate cost sits.

Populations per (scale, query):
  straggler     total < ns            (order-free: ANY chunk order is legal)
  near          ns <= total, h high   (needs exact first-ns ranking)
  dense         h low                 (cheap under today's chunk gate)

Modeled strategies (units = subtile_rows x slots x chunks, like gating_stats):
  twogate32     current kernel (composite shared-scale sort, min(chunk,slot))
  list-strag    stragglers pay |tile chunk list| x cap; others as twogate
  list-all      stragglers as above; near/dense pay RANKCOST x |list| x ns
                (min-chain ranking modeled at RANKCOST x the unit cost)
  perq-list     per-query |own list| x own slots (granularity-free floor)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from or4d_tpu.config import DatasetConfig
from or4d_tpu.data.synthetic import make_scene_batch
from tests.reference_impls import fps_np

CHUNK = 512
SUB = 32
RANKCOST = 2.2  # min-chain select+reduce+eq+matmul vs compare+matmul


def morton_codes(xyz: np.ndarray, bits: int = 8) -> np.ndarray:
    lo = xyz.min(axis=0)
    hi = xyz.max(axis=0)
    q = ((xyz - lo) / np.maximum(hi - lo, 1e-9) * (2**bits - 1)).astype(np.uint32)
    code = np.zeros(len(xyz), dtype=np.uint64)
    for b in range(bits):
        for d in range(3):
            code |= (((q[:, d] >> b) & 1).astype(np.uint64)) << np.uint64(3 * b + d)
    return code


def query_stats(d2, r2, ns, nch):
    hit = d2 < r2
    total = hit.sum(axis=1)
    csum = np.cumsum(hit, axis=1)
    thr = np.minimum(total, ns)
    crossed = csum >= np.maximum(thr, 1)[:, None]
    hi = np.argmax(crossed, axis=1) // CHUNK + 1
    return total, hi


def main():
    ds = DatasetConfig()
    batch = make_scene_batch(num_scenes=2, seed=0, n_objects=9, ds=ds, points_per_obj=2000)
    rel = np.asarray(batch.rel_points)
    mask = np.asarray(batch.edge_mask).astype(bool)
    clouds = rel[mask][:, :, :3]
    rows = clouds[:16]
    N = rows.shape[1]
    nch = (N + CHUNK - 1) // CHUNK
    scales = ((0.1, 16), (0.2, 32))
    print(f"rows={len(rows)} N={N} nch={nch} sub={SUB} rankcost={RANKCOST}")

    agg = {}
    for row in rows:
        qidx = fps_np(row[None], 512)[0]
        q = row[qidx]
        s_order = np.argsort(morton_codes(row), kind="stable")
        row_m = row[s_order]
        # per-Morton-chunk AABBs
        aabb_lo = np.stack([row_m[c * CHUNK : (c + 1) * CHUNK].min(0) for c in range(nch)])
        aabb_hi = np.stack([row_m[c * CHUNK : (c + 1) * CHUNK].max(0) for c in range(nch)])
        # per-query distance to each chunk AABB (0 if inside)
        d_ax = np.maximum(aabb_lo[None] - q[:, None, :], 0) + np.maximum(
            q[:, None, :] - aabb_hi[None], 0
        )
        d2_aabb = (d_ax**2).sum(-1)  # (512, nch)

        d2 = ((q[:, None, :] - row[None, :, :]) ** 2).sum(-1)
        per_scale = {}
        for radius, ns in scales:
            per_scale[(radius, ns)] = query_stats(d2, radius * radius, ns, nch)
        (t1, h1), (t2, h2) = per_scale.values()
        (_, ns1), (_, ns2) = [(r, n) for r, n in scales]
        k1 = np.where(t1 >= ns1, h1, 1000 + t1)
        k2 = np.where(t2 >= ns2, h2, 1000 + t2)
        shared = np.argsort(k2 * 2000 + k1, kind="stable")

        for radius, ns in scales:
            r2 = radius * radius
            total, hi = per_scale[(radius, ns)]
            # chunk list per query: AABB within radius (conservative superset)
            qlist = d2_aabb < r2  # (512, nch) bool
            L = qlist.sum(1)
            strag = total < ns
            base = 512 * nch * ns
            key = (radius, ns)
            a = agg.setdefault(
                key,
                {
                    "L": [],
                    "strag": [],
                    "cost_strag": 0.0,
                    "cost_near": 0.0,
                    "cost_dense": 0.0,
                    "res": {},
                    "base": 0.0,
                },
            )
            a["L"].append(L.mean())
            a["strag"].append(strag.mean())
            a["base"] += base

            # --- current two-gate on the shared composite order, with
            # population attribution (tile cost assigned to its majority pop)
            u_two = 0.0
            for t in range(0, 512, SUB):
                sel = shared[t : t + SUB]
                h = int(hi[sel].max())
                cap = min(ns, max(1, int(total[sel].max())))
                c = SUB * min(h * ns, cap * nch)
                u_two += c
                ns_frac = strag[sel].mean()
                h_low = h <= 4
                if ns_frac > 0.5:
                    a["cost_strag"] += c
                elif h_low:
                    a["cost_dense"] += c
                else:
                    a["cost_near"] += c
            a["res"].setdefault("twogate32", []).append(u_two / base)

            # --- morton-list strategies; sort queries: dense by h, then near
            # by (Lt approx) then stragglers by morton code of the query
            qm = morton_codes(q)
            pop = np.where(strag, 2, np.where(hi <= 4, 0, 1))
            keyl = pop * (1 << 40) + np.where(pop == 0, hi, 0) * (1 << 32) + qm.astype(np.int64)
            lord = np.argsort(keyl, kind="stable")

            u_ls = 0.0  # list-strag: stragglers via list, others two-gate
            u_la = 0.0  # list-all: near via min-chain on list
            for t in range(0, 512, SUB):
                sel = lord[t : t + SUB]
                tile_list = qlist[sel].any(0).sum()
                h = int(hi[sel].max())
                cap = min(ns, max(1, int(total[sel].max())))
                two = SUB * min(h * ns, cap * nch)
                if strag[sel].all():
                    c_s = SUB * tile_list * cap
                    u_ls += min(c_s, two)
                    u_la += min(c_s, two)
                elif strag[sel].any():
                    # mixed tile: pay both sub-passes
                    c_mix = SUB * (tile_list * cap + h * ns)
                    u_ls += min(c_mix, two)
                    u_la += min(c_mix, two)
                else:
                    u_ls += two
                    c_n = SUB * RANKCOST * tile_list * ns
                    u_la += min(c_n, two)
            a["res"].setdefault("list-strag32", []).append(u_ls / base)
            a["res"].setdefault("list-all32", []).append(u_la / base)

            # --- granularity-free floors
            u_pq = float(
                np.where(
                    strag,
                    L * np.minimum(np.maximum(total, 1), ns),
                    np.minimum(hi * ns, nch * np.minimum(total, ns)),
                ).sum()
            )
            a["res"].setdefault("perq-today-pops", []).append(u_pq / base)
            u_pq2 = float(
                np.where(
                    strag,
                    L * np.minimum(np.maximum(total, 1), ns),
                    RANKCOST * L * ns,
                ).sum()
            )
            a["res"].setdefault("perq-list-all", []).append(u_pq2 / base)

    for (radius, ns), a in agg.items():
        tot = a["cost_strag"] + a["cost_near"] + a["cost_dense"]
        print(
            f"\nscale r={radius} ns={ns}  stragglers={np.mean(a['strag'])*100:.0f}%  "
            f"mean per-query chunk list={np.mean(a['L']):.2f} of {16}"
        )
        print(
            f"  twogate cost split: strag {a['cost_strag']/tot*100:.0f}%  "
            f"near {a['cost_near']/tot*100:.0f}%  dense {a['cost_dense']/tot*100:.0f}%"
        )
        for k, v in a["res"].items():
            print(f"  {k:>16}: {np.mean(v)*100:5.1f}% of ungated work")


if __name__ == "__main__":
    main()
