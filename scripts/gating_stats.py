"""Host-side statistics for fused-kernel gating strategies (no TPU needed).

For the SA1 relation stage at bench shapes, measures per-query and per-sub-tile
gate bounds under several support/query orderings, and prints each strategy's
work (slots x chunks actually computed) relative to the ungated nch*ns.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from or4d_tpu.config import DatasetConfig
from or4d_tpu.data.synthetic import make_scene_batch
from tests.reference_impls import fps_np

CHUNK = 512


def morton_codes(xyz: np.ndarray, bits: int = 8) -> np.ndarray:
    lo = xyz.min(axis=0)
    hi = xyz.max(axis=0)
    q = ((xyz - lo) / np.maximum(hi - lo, 1e-9) * (2**bits - 1)).astype(np.uint32)
    code = np.zeros(len(xyz), dtype=np.uint64)
    for b in range(bits):
        for d in range(3):
            code |= (((q[:, d] >> b) & 1).astype(np.uint64)) << np.uint64(3 * b + d)
    return code


def query_stats(d2: np.ndarray, r2: float, ns: int, nch: int):
    hit = d2 < r2
    total = hit.sum(axis=1)
    csum = np.cumsum(hit, axis=1)
    thr = np.minimum(total, ns)
    crossed = csum >= np.maximum(thr, 1)[:, None]
    cross_idx = np.argmax(crossed, axis=1)
    hi = cross_idx // CHUNK + 1  # exclusive chunk bound
    first_idx = np.argmax(hit, axis=1)
    lo = np.where(total > 0, first_idx // CHUNK, 0)
    return total, lo, hi


def tile_work(order, lo, hi, total, ns, nch, sub, windowed):
    """Total query-slot-chunk units: sum over tiles of sub * slots * chunks."""
    u = 0
    for t in range(0, len(order), sub):
        sel = order[t : t + sub]
        h = int(hi[sel].max())
        l = int(lo[sel].min()) if windowed else 0
        slots = min(ns, max(1, int(total[sel].max())))
        u += len(sel) * (h - l) * slots
    return u


def main():
    ds = DatasetConfig()
    batch = make_scene_batch(num_scenes=2, seed=0, n_objects=9, ds=ds, points_per_obj=2000)
    rel = np.asarray(batch.rel_points)
    mask = np.asarray(batch.edge_mask).astype(bool)
    clouds = rel[mask][:, :, :3]
    rows = clouds[:24]
    N = rows.shape[1]
    nch = (N + CHUNK - 1) // CHUNK
    scales = ((0.1, 16), (0.2, 32))
    print(f"rows={len(rows)} N={N} nch={nch}")

    agg = {}
    for row in rows:
        qidx = fps_np(row[None], 512)[0]
        q = row[qidx]
        s_order = np.argsort(morton_codes(row), kind="stable")
        row_m = row[s_order]
        # shared order across scales, from exact per-scale (need, total):
        # sort by scale-2 composite (the costlier scale), stragglers last
        shared = None
        per_scale = {}
        for radius, ns in scales:
            r2 = radius * radius
            d2_ = ((q[:, None, :] - row[None, :, :]) ** 2).sum(-1)
            per_scale[(radius, ns)] = query_stats(d2_, r2, ns, nch)
        (t1, l1, h1), (t2, l2, h2) = per_scale.values()
        (_, ns1), (_, ns2) = [(r, n) for r, n in scales]
        k1 = np.where(t1 >= ns1, h1, 1000 + t1)
        k2 = np.where(t2 >= ns2, h2, 1000 + t2)
        shared = np.argsort(k2 * 2000 + k1, kind="stable")
        for radius, ns in scales:
            r2 = radius * radius
            d2 = ((q[:, None, :] - row[None, :, :]) ** 2).sum(-1)
            total, lo, hi = query_stats(d2, r2, ns, nch)
            d2m = ((q[:, None, :] - row_m[None, :, :]) ** 2).sum(-1)
            total_m, lo_m, hi_m = query_stats(d2m, r2, ns, nch)

            base = 512 * nch * ns
            key = (radius, ns)
            a = agg.setdefault(key, {"straggler": [], "winw": [], "res": {}})
            a["straggler"].append(float((total < ns).mean()))
            a["winw"].append(float(np.mean(hi_m - lo_m)))

            dens = np.argsort(-total, kind="stable")
            # composite: dense queries by crossing chunk asc, stragglers by total asc
            comp = np.argsort(np.where(total >= ns, hi, 1000 + total), kind="stable")
            # morton support: order queries by their first-hit chunk then hi
            mord = np.argsort(lo_m * 64 + hi_m, kind="stable")
            comp_m = np.argsort(
                np.where(total_m >= ns, lo_m * 64 + hi_m, 100000 + lo_m * 64 + hi_m), kind="stable"
            )
            runs = {
                "mort-win128": (mord, lo_m, hi_m, total_m, True, 128),
                "mort-win64": (mord, lo_m, hi_m, total_m, True, 64),
                "mort-win32": (mord, lo_m, hi_m, total_m, True, 32),
                "ideal-perq": (np.arange(512), lo_m, hi_m, total_m, True, 1),
            }
            for k, (o, l, h, tt, w, sub) in runs.items():
                u = tile_work(o, l, h, tt, ns, nch, sub, w) / base
                a["res"].setdefault(k, []).append(u)

            # implementable ordering: density estimate from a strided
            # 512-point subsample (what the wrapper actually sorts by)
            stride = max(1, row.shape[0] // CHUNK)
            sub_pts = row[::stride][:CHUNK]
            d2e = ((q[:, None, :] - sub_pts[None, :, :]) ** 2).sum(-1)
            est = (d2e < min(s[0] for s in scales) ** 2).sum(1)
            dens_est = np.argsort(-est, kind="stable")
            for sub in (32, 64):
                u_min = 0
                for t in range(0, 512, sub):
                    sel = dens_est[t : t + sub]
                    h = int(hi[sel].max())
                    slots = min(ns, max(1, int(total[sel].max())))
                    u_min += sub * min(h * ns, slots * nch)
                a["res"].setdefault(f"mingate{sub}-est", []).append(u_min / base)
            for sub in (32, 64):
                u_min = 0
                for t in range(0, 512, sub):
                    sel = shared[t : t + sub]
                    h = int(hi[sel].max())
                    slots = min(ns, max(1, int(total[sel].max())))
                    u_min += sub * min(h * ns, slots * nch)
                a["res"].setdefault(f"mingate{sub}-shared", []).append(u_min / base)

            # estimated composite key from a strided SUB-point subsample:
            # est_total = hits*scale, est_need = crossing position scaled to
            # full-scan chunks; only the ORDER uses these (bounds are exact
            # in-kernel), so noise costs homogeneity, not correctness
            for nsub in (1024, 2048):
                strd = max(1, row.shape[0] // nsub)
                spts = row[::strd][:nsub]
                scl = row.shape[0] / len(spts)
                d2s = ((q[:, None, :] - spts[None, :, :]) ** 2).sum(-1)
                hits = d2s < r2
                et = hits.sum(1) * scl
                cs = np.cumsum(hits, axis=1)
                thr_e = np.minimum(et / scl, ns / scl)
                crossed = cs >= np.maximum(thr_e, 1)[:, None]
                cidx = np.argmax(crossed, axis=1) * scl
                eneed = cidx // CHUNK + 1
                ekey = np.where(et >= ns, eneed, 1000 + et)
                eord = np.argsort(ekey, kind="stable")
                for sub in (32,):
                    u_min = 0
                    for t in range(0, 512, sub):
                        sel = eord[t : t + sub]
                        h = int(hi[sel].max())
                        slots = min(ns, max(1, int(total[sel].max())))
                        u_min += sub * min(h * ns, slots * nch)
                    a["res"].setdefault(f"mingate{sub}-est{nsub}", []).append(u_min / base)
            # unsorted (FPS order) mingate
            u_min = 0
            for t in range(0, 512, 32):
                sel = np.arange(t, t + 32)
                h = int(hi[sel].max())
                slots = min(ns, max(1, int(total[sel].max())))
                u_min += 32 * min(h * ns, slots * nch)
            a["res"].setdefault("mingate32-unsorted", []).append(u_min / base)

            # EXACT hybrid: dense rows chunk-gate in SCAN order (first-ns
            # semantics), straggler rows (total < ns: every hit selected,
            # order-free) window-gate in MORTON order. Stragglers sorted by
            # their own morton window so sub-tiles are spatially compact.
            strag = total < ns
            key_h = np.where(
                strag,
                100000 + lo_m * 64 + hi_m,  # stragglers last, spatially clustered
                hi,  # dense by scan-order crossing chunk
            )
            hord = np.argsort(key_h, kind="stable")
            for sub in (32, 64):
                u_h = 0
                for t in range(0, 512, sub):
                    sel = hord[t : t + sub]
                    sd = sel[~strag[sel]]
                    ss = sel[strag[sel]]
                    if len(sd):  # dense sub-pass over the whole tile width
                        u_h += sub * int(hi[sd].max()) * ns
                    if len(ss):  # straggler morton-window sub-pass
                        cap = max(1, int(total[ss].max()))
                        u_h += sub * (int(hi_m[ss].max()) - int(lo_m[ss].min())) * cap
                a["res"].setdefault(f"hybrid{sub}", []).append(u_h / base)
            # same but mixed tiles pay only their own rows (perfect masking)
            for sub in (32,):
                u_h = 0
                for t in range(0, 512, sub):
                    sel = hord[t : t + sub]
                    sd = sel[~strag[sel]]
                    ss = sel[strag[sel]]
                    if len(sd):
                        u_h += len(sd) * int(hi[sd].max()) * ns
                    if len(ss):
                        cap = max(1, int(total[ss].max()))
                        u_h += len(ss) * (int(hi_m[ss].max()) - int(lo_m[ss].min())) * cap
                a["res"].setdefault(f"hybrid{sub}-rowexact", []).append(u_h / base)

            # realizable single-dynamic-axis variants (original support order):
            # per tile choose min(chunk-gate with full slots, slot-gate with
            # full chunks); and morton windows with slots full (static unroll)
            for sub in (32, 64, 128):
                u_min = 0
                for t in range(0, 512, sub):
                    sel = comp[t : t + sub]
                    h = int(hi[sel].max())
                    slots = min(ns, max(1, int(total[sel].max())))
                    u_min += sub * min(h * ns, slots * nch)
                a["res"].setdefault(f"mingate{sub}", []).append(u_min / base)
                u_w = 0
                for t in range(0, 512, sub):
                    sel = mord[t : t + sub]
                    h = int(hi_m[sel].max())
                    l = int(lo_m[sel].min())
                    u_w += sub * (h - l) * ns
                a["res"].setdefault(f"mort-winfull{sub}", []).append(u_w / base)

    for (radius, ns), a in agg.items():
        print(
            f"\nscale r={radius} ns={ns}  stragglers={np.mean(a['straggler'])*100:.0f}%  "
            f"mean morton window={np.mean(a['winw']):.2f} chunks"
        )
        for k, v in a["res"].items():
            print(f"  {k:>15}: {np.mean(v)*100:5.1f}% of ungated work")


if __name__ == "__main__":
    main()
