"""Measured torch-CPU baseline for the reference SGPN inference path.

The reference publishes no throughput numbers and this image has no CUDA, so
the A100 denominator behind `bench.py`'s vs_baseline cannot be measured
directly. This script pins down the part that CAN be measured: a faithful
torch implementation of the reference's inference math (PointNet++ MSG
encoders with FPS + first-k ball query + grouping, TripletGCN, heads —
`scene_graph_prediction_model.py:87-109` wiring at batch_size = 1 scene) run
on the SAME synthetic scenes as bench.py, on this host's CPU.

The CPU->A100 extrapolation lives in BASELINE.md; this script prints the
measured CPU scenes/sec plus the workload stats the derivation uses.

Vectorized torch ops only (no python-per-point loops) so the baseline is not
handicapped: FPS is the 512-step vectorized update the CUDA kernel runs,
ball query is a sort-based first-k selection equivalent to the scan-order
semantics, grouping/convs/GCN are plain batched torch.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import torch
import torch.nn.functional as F


def fps_torch(xyz: torch.Tensor, npoint: int) -> torch.Tensor:
    """(B, N, 3) -> (B, npoint) — sequential in npoint, vectorized in B*N
    (sampling_gpu.cu:69-173 semantics incl. start-at-0 and mag<=1e-3 skip)."""
    B, N, _ = xyz.shape
    mag = (xyz * xyz).sum(-1)
    valid = mag > 1e-3
    mind = torch.full((B, N), float("inf"))
    out = torch.zeros((B, npoint), dtype=torch.long)
    old = torch.zeros((B,), dtype=torch.long)
    ar = torch.arange(B)
    for j in range(1, npoint):
        cur = xyz[ar, old]  # (B, 3)
        d = ((xyz - cur[:, None, :]) ** 2).sum(-1)
        mind = torch.minimum(mind, d)
        masked = torch.where(valid, mind, torch.full_like(mind, -1.0))
        old = masked.argmax(-1)
        out[:, j] = old
    return out


def ball_query_torch(radius: float, nsample: int, xyz: torch.Tensor, new_xyz: torch.Tensor) -> torch.Tensor:
    """(B,N,3),(B,M,3) -> (B,M,ns) first-k-in-scan-order with first-hit fill
    (ball_query_gpu.cu:9-44), as a vectorized masked-sort selection."""
    B, N, _ = xyz.shape
    d2 = torch.cdist(new_xyz, xyz) ** 2  # (B, M, N)
    hit = d2 < radius * radius
    key = torch.where(hit, torch.arange(N)[None, None, :].expand_as(hit), N + torch.arange(N)[None, None, :])
    idx = key.sort(dim=-1).values[..., :nsample]
    first = idx[..., :1].clamp(max=N - 1) % N
    total = hit.sum(-1, keepdim=True)
    slots = torch.arange(nsample)[None, None, :]
    return torch.where(slots < total, idx % N, first)


def conv_stack(params, x):
    for w, bn in params:
        x = x @ w.T
        x = (x - bn[2]) / torch.sqrt(bn[3] + 1e-5) * bn[0] + bn[1]
        x = F.relu(x)
    return x


def make_params(rng, widths):
    out = []
    for cin, cout in zip(widths[:-1], widths[1:]):
        w = torch.from_numpy(rng.standard_normal((cout, cin)).astype(np.float32) * 0.1)
        bn = [torch.ones(cout), torch.zeros(cout), torch.zeros(cout), torch.ones(cout)]
        out.append((w, bn))
    return out


class TorchSGPN:
    """Reference inference graph, eval mode, functional weights."""

    SA = (
        (512, ((0.1, 16), (0.2, 32))),
        (128, ((0.2, 32), (0.4, 64))),
    )

    def __init__(self, rng, in_dims=(6, 7)):
        self.enc = {}
        for name, ind in zip(("obj", "rel"), in_dims):
            specs = {
                0: {0: [ind, 64, 64], 1: [ind, 64, 128]},
                1: {0: [195, 128, 128], 1: [195, 128, 128]},
                2: {0: [259, 256, 256]},
            }
            self.enc[name] = {
                s: {k: make_params(rng, w) for k, w in ks.items()} for s, ks in specs.items()
            }
        self.gcn = []
        for _ in range(2):
            self.gcn.append({
                "nn1": make_params(rng, [768, 512, 1280]),
                "nn2": make_params(rng, [512, 512]) + [(torch.from_numpy(rng.standard_normal((256, 512)).astype(np.float32) * 0.1), None)],
            })
        lin = lambda cin, cout: (
            torch.from_numpy(rng.standard_normal((cout, cin)).astype(np.float32) * 0.05),
            torch.from_numpy(rng.standard_normal(cout).astype(np.float32) * 0.05),
        )
        self.obj_head = [lin(256, 512), lin(512, 256), lin(256, 12)]
        self.rel_head = [lin(256, 512), lin(512, 256), lin(256 + 12, 15)]

    def encoder(self, name, pc):
        xyz = pc[..., :3]
        feats = pc[..., 3:]
        for s, (npoint, scales) in enumerate(self.SA):
            idx = fps_torch(xyz, npoint)
            new_xyz = torch.gather(xyz, 1, idx[..., None].expand(-1, -1, 3))
            outs = []
            for k, (radius, nsample) in enumerate(scales):
                qidx = ball_query_torch(radius, nsample, xyz, new_xyz)  # (B,M,ns)
                gi = qidx.reshape(qidx.shape[0], -1, 1)
                g_xyz = torch.gather(xyz, 1, gi.expand(-1, -1, 3)).reshape(*qidx.shape, 3) - new_xyz[:, :, None, :]
                g_f = torch.gather(feats, 1, gi.expand(-1, -1, feats.shape[-1])).reshape(*qidx.shape, feats.shape[-1])
                grouped = torch.cat([g_xyz, g_f], dim=-1)
                h = conv_stack(self.enc[name][s][k], grouped)
                outs.append(h.max(dim=2).values)
            xyz = new_xyz
            feats = torch.cat(outs, dim=-1)
        g = torch.cat([xyz, feats], dim=-1)
        return conv_stack(self.enc[name][2][0], g).max(dim=1).values

    def gcn_forward(self, x, e, src, dst):
        def mlp(params, v, on_last):
            n = len(params)
            for i, (w, bn) in enumerate(params):
                v = v @ w.T
                if i < n - 1 or on_last:
                    mean = v.mean(0)
                    var = v.var(0, unbiased=False)
                    v = F.relu((v - mean) / torch.sqrt(var + 1e-5))
            return v

        for i, layer in enumerate(self.gcn):
            triplet = torch.cat([x[dst], e, x[src]], dim=1)
            h = mlp(layer["nn1"], triplet, on_last=True)
            msg = h[:, :512] + h[:, 768:]
            e_new = h[:, 512:768]
            agg = torch.zeros((x.shape[0], 512))
            agg.index_add_(0, dst, msg)
            x = mlp(layer["nn2"], agg, on_last=False)
            e = e_new
            if i < len(self.gcn) - 1:
                x, e = F.relu(x), F.relu(e)
        return x, e

    def head(self, params, x, onehot=None):
        (w1, b1), (w2, b2), (w3, b3) = params
        x = F.relu(x @ w1.T + b1)
        x = F.relu(x @ w2.T + b2)
        if onehot is not None:
            x = torch.cat([x, onehot], dim=1)
        return F.log_softmax(x @ w3.T + b3, dim=-1)

    @torch.no_grad()
    def forward_scene(self, obj_pc, rel_pc, src, dst, onehot):
        obj = self.encoder("obj", obj_pc)
        rel = self.encoder("rel", rel_pc)
        x, e = self.gcn_forward(obj, rel, src, dst)
        return self.head(self.obj_head, x), self.head(self.rel_head, e, onehot)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--threads", type=int, default=0, help="0 = torch default (all cores)")
    args = ap.parse_args()
    if args.threads:
        torch.set_num_threads(args.threads)

    from or4d_tpu.config import DatasetConfig
    from or4d_tpu.data.synthetic import make_scene_batch

    ds = DatasetConfig()
    batch = make_scene_batch(num_scenes=args.scenes, seed=0, n_objects=9, ds=ds, points_per_obj=2000)
    scenes = []
    for s in range(args.scenes):
        om = np.asarray(batch.obj_mask[s]).astype(bool)
        em = np.asarray(batch.edge_mask[s]).astype(bool)
        scenes.append((
            torch.from_numpy(np.asarray(batch.obj_points[s])[om]),
            torch.from_numpy(np.asarray(batch.rel_points[s])[em]),
            torch.from_numpy(np.asarray(batch.edge_index[s])[em, 0]).long(),
            torch.from_numpy(np.asarray(batch.edge_index[s])[em, 1]).long(),
            torch.from_numpy(np.asarray(batch.rel_onehot[s])[em]),
        ))

    model = TorchSGPN(np.random.default_rng(0))
    model.forward_scene(*scenes[0])  # warm

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        for sc in scenes:
            model.forward_scene(*sc)
        times.append((time.perf_counter() - t0) / args.scenes)
    per_scene = float(np.median(times))
    n_obj = scenes[0][0].shape[0]
    n_rel = scenes[0][1].shape[0]
    print(json.dumps({
        "metric": "reference_torch_cpu_scenes_per_sec",
        "value": round(1.0 / per_scene, 4),
        "per_scene_ms": round(per_scene * 1e3, 1),
        "objects_per_scene": int(n_obj),
        "relations_per_scene": int(n_rel),
        "torch_threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
