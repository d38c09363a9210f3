"""Round-5 model, part 2: hybrid straggler-list kernel with d2/prefix savings.

gating_stats2 showed chunk-lists lose on SLOT work at 32-row granularity, but
only counted slot units. This models TOTAL kernel cost (ms, calibrated to the
round-4 on-chip decomposition) of a hybrid:

  main pass   dense+near queries only, composite-sorted, two-gate (as today).
              Removing stragglers tightens every tile (no mixed-tile pinning).
  strag pass  stragglers are ORDER-FREE (total < ns: every hit is taken and
              eval maxpool is slot-order-invariant), so supports may be
              scanned in Morton order: each straggler tile scans only the
              UNION of its rows' Morton chunk lists (AABB-within-radius),
              computing d2 + hit-prefix ranks over listed chunks only.

Cost calibration (640 rows, both scales, v4 kernel = 188 ms measured):
  slot unit  = (subtile row, slot, chunk) compare+one-hot dot ~ 26 ns
  d2/prefix  = per (row, chunk) fixed work; ~70 ms at 640 rows x 16 chunks
               covers d2 tiles + tri prefix + rank planes => ~0.34 ns*512
               per (row, chunk) ... we model it as FIXED_MS scaled by the
               fraction of (row, chunk) pairs actually computed.
Both passes pay their own d2 over their own rows; the strag pass d2 only on
listed chunks. Main-pass rows still number 512 per crop row (static shape):
stragglers are sorted LAST and their tiles get bound 0 in the main pass
(cost ~0 beyond the subtile dispatch), so we model main-pass d2 only over
non-straggler tiles.
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
NCH = None  # set in main

UNIT_NS = 26.0  # per (row, slot, chunk) selection unit, measured round-4
FIXED_MS_640 = 70.0  # d2 + prefix + rank planes, 640 rows x 16 chunks, 2 scales


def morton_codes(xyz: np.ndarray, bits: int = 8) -> np.ndarray:
    lo = xyz.min(axis=0)
    hi = xyz.max(axis=0)
    q = ((xyz - lo) / np.maximum(hi - lo, 1e-9) * (2**bits - 1)).astype(np.uint32)
    code = np.zeros(len(xyz), dtype=np.uint64)
    for b in range(bits):
        for d in range(3):
            code |= (((q[:, d] >> b) & 1).astype(np.uint64)) << np.uint64(3 * b + d)
    return code


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

    # accumulated (row, chunk)-pair and slot-unit counts per strategy
    acc = {
        "today_units": 0.0,
        "today_rc": 0.0,
        "hyb_units_main": 0.0,
        "hyb_units_strag": 0.0,
        "hyb_rc_main": 0.0,
        "hyb_rc_strag": 0.0,
        "strag_tiles": 0,
        "strag_list": [],
    }
    n_rows = len(rows)

    for row in rows:
        qidx = fps_np(row[None], 512)[0]
        q = row[qidx]
        s_order = np.argsort(morton_codes(row), kind="stable")
        row_m = row[s_order]
        aabb_lo = np.stack([row_m[c * CHUNK : (c + 1) * CHUNK].min(0) for c in range(nch)])
        aabb_hi = np.stack([row_m[c * CHUNK : (c + 1) * CHUNK].max(0) for c in range(nch)])
        d_ax = np.maximum(aabb_lo[None] - q[:, None, :], 0) + np.maximum(
            q[:, None, :] - aabb_hi[None], 0
        )
        d2_aabb = (d_ax**2).sum(-1)

        d2 = ((q[:, None, :] - row[None, :, :]) ** 2).sum(-1)
        per = {}
        for radius, ns in scales:
            hit = d2 < radius * radius
            total = hit.sum(1)
            csum = np.cumsum(hit, axis=1)
            thr = np.minimum(total, ns)
            hi = np.argmax(csum >= np.maximum(thr, 1)[:, None], axis=1) // CHUNK + 1
            per[(radius, ns)] = (total, hi, d2_aabb < radius * radius)

        (t1, h1, l1), (t2, h2, l2) = per.values()
        ns1, ns2 = scales[0][1], scales[1][1]
        strag1 = t1 < ns1
        strag2 = t2 < ns2

        # ---------- today: shared composite sort, both scales in one kernel
        k1 = np.where(strag1, 1000 + t1, h1)
        k2 = np.where(strag2, 1000 + t2, h2)
        shared = np.argsort(k2 * 2000 + k1, kind="stable")
        for (radius, ns), (total, hi, _) in per.items():
            strag = total < ns
            for t in range(0, 512, SUB):
                sel = shared[t : t + SUB]
                h = int(hi[sel].max())
                cap = min(ns, max(1, int(total[sel].max())))
                acc["today_units"] += SUB * min(h * ns, cap * nch)
        # d2/prefix: today always full rows x nch (shared across scales)
        acc["today_rc"] += 512 * nch

        # ---------- hybrid:
        # a query is in the STRAG pass if it is a straggler in BOTH scales?
        # No — passes are per scale (each scale selects its own slots); a
        # query can be strag in scale 1 and dense in scale 2. The main pass
        # runs both scales off one d2 (as today) over queries that are
        # NON-strag in at least one scale; scale-s slots for queries that are
        # strag in s are handled in the strag pass. Queries strag in BOTH
        # scales contribute nothing to the main pass (d2 skipped via bound 0
        # -- but their ROWS still occupy main-pass tiles; we sort them last
        # and drop their d2 cost).
        both_strag = strag1 & strag2
        main_q = ~both_strag
        # main-pass composite sort over main queries only (stragglers in one
        # scale sort by their other scale's key; their strag scale gets
        # bound 0 in the main pass)
        mk1 = np.where(strag1, 0, h1)  # bound-0 for strag scale
        mk2 = np.where(strag2, 0, h2)
        order_main = np.argsort(
            np.where(main_q, mk2 * 2000 + mk1, 10**9), kind="stable"
        )
        n_main_tiles = int(np.ceil(main_q.sum() / SUB))
        for (radius, ns), (total, hi, _) in per.items():
            strag = total < ns
            hib = np.where(strag, 0, hi)
            capb = np.where(strag, 0, np.minimum(total, ns))
            for t in range(0, 512, SUB):
                sel = order_main[t : t + SUB]
                if not main_q[sel].any():
                    continue
                h = int(hib[sel].max())
                cap = int(capb[sel].max())
                if h == 0 or cap == 0:
                    continue
                acc["hyb_units_main"] += SUB * min(h * ns, cap * nch)
        acc["hyb_rc_main"] += n_main_tiles * SUB * nch

        # strag pass per scale: Morton-sort that scale's stragglers, tiles
        # scan the union chunk list; ranks over listed chunks only.
        qm = morton_codes(q)
        for (radius, ns), (total, hi, qlist) in per.items():
            strag = total < ns
            sidx = np.where(strag)[0]
            sidx = sidx[np.argsort(qm[sidx], kind="stable")]
            for t in range(0, len(sidx), SUB):
                sel = sidx[t : t + SUB]
                ulist = int(qlist[sel].any(0).sum())
                ulist = max(ulist, 1)
                cap = min(ns, max(1, int(total[sel].max())))
                acc["hyb_units_strag"] += SUB * ulist * cap
                acc["hyb_rc_strag"] += SUB * ulist
                acc["strag_tiles"] += 1
                acc["strag_list"].append(ulist)

    # ---- convert to ms at 640 rows (scale by 640 / n_rows)
    f = 640 / n_rows
    unit_ms = UNIT_NS * 1e-6
    rc_ms = FIXED_MS_640 / (640 * 512 * nch)  # per (query-row, chunk) pair
    today = acc["today_units"] * f * unit_ms + acc["today_rc"] * f * rc_ms
    hyb = (
        (acc["hyb_units_main"] + acc["hyb_units_strag"]) * f * unit_ms
        + (acc["hyb_rc_main"] + acc["hyb_rc_strag"]) * f * rc_ms * 1.0
    )
    print(f"rows={n_rows} (scaled to 640)  nch={nch}")
    print(
        f"today:  slot {acc['today_units']*f*unit_ms:6.1f} ms  "
        f"d2/prefix {acc['today_rc']*f*rc_ms:6.1f} ms  total {today:6.1f} ms"
    )
    print(
        f"hybrid: main slot {acc['hyb_units_main']*f*unit_ms:6.1f}  "
        f"strag slot {acc['hyb_units_strag']*f*unit_ms:6.1f}  "
        f"main d2 {acc['hyb_rc_main']*f*rc_ms:6.1f}  "
        f"strag d2 {acc['hyb_rc_strag']*f*rc_ms:6.1f}  total {hyb:6.1f} ms"
    )
    print(
        f"strag tiles/row-pair: {acc['strag_tiles']/n_rows:.1f}, "
        f"mean union list {np.mean(acc['strag_list']):.2f} of {nch}"
    )
    print(f"modeled kernel win: {today:.1f} -> {hyb:.1f} ms ({(1-hyb/today)*100:.0f}%)")
    print(
        "NOTE: strag pass also needs a Morton-permuted support copy "
        "(prep-side) and its own kernel launch; main pass keeps today's "
        "structure with tighter tiles."
    )


if __name__ == "__main__":
    main()
