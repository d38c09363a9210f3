"""Triplet GCN — message passing over (subject, edge, object) triplets.

Reference: `scene_graph_helpers/model/gcns/network_TripletGCN.py`:
  * message (x_i, e, x_j) -> nn1 -> split (dx_i | e' | dx_j); the node message
    is dx_i + dx_j (message :45-52);
  * aggregation: scatter-add of messages at the TARGET node of each edge
    (torch_geometric source_to_target flow, aggregate :54-58);
  * node update: nn2 on the aggregate; edge update: e' directly;
  * N stacked layers with ReLU between (not after the last) (:72-80);
  * nn1 = MLP [2*node+edge, hidden, 2*hidden+edge] with BN+ReLU on ALL layers
    (on_last=True); nn2 = MLP [hidden, hidden, node] BN+ReLU between.
    All BN is track_running_stats=False (batch stats always).

TPU formulation: per-scene static shapes (O nodes, E edges) under vmap; the
scatter is `jax.ops.segment_sum` with padded edges masked to zero. Batched
over scenes, BN statistics pool all valid edges/nodes in the global batch
(exactly the reference at scene_batch=1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from or4d_tpu import ops
from or4d_tpu.models.layers import MLP


class TripletGCNLayer(nn.Module):
    dim_node: int
    dim_edge: int
    dim_hidden: int
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, edge_feature, edge_index, obj_mask, edge_mask, train: bool = True):
        """x: (S, O, Dn); edge_feature: (S, E, De); edge_index: (S, E, 2) of
        (source, target) slot ids; masks: (S, O), (S, E)."""
        S, O, _ = x.shape
        src = edge_index[..., 0]
        dst = edge_index[..., 1]
        x_j = jnp.take_along_axis(x, src[..., None], axis=1)  # source nodes
        x_i = jnp.take_along_axis(x, dst[..., None], axis=1)  # target nodes
        # torch_geometric convention: message gets x_i=target, x_j=source but
        # the reference concatenates [x_i, e, x_j] with x_i the EDGE-SOURCE
        # under its propagate(edge_index) call where row0=source. With default
        # flow, x_i is edge_index[1]; the reference builds edges (n, m) for
        # every ordered pair, so the layout is symmetric over the fully
        # connected graph; we follow the torch_geometric binding exactly.
        triplet = jnp.concatenate([x_i, edge_feature, x_j], axis=-1)
        h = MLP(
            (self.dim_hidden, self.dim_hidden * 2 + self.dim_edge),
            do_bn=self.use_bn,
            on_last=True,
            name="nn1",
        )(triplet, mask=edge_mask, train=train)
        dx_i = h[..., : self.dim_hidden]
        new_e = h[..., self.dim_hidden : self.dim_hidden + self.dim_edge]
        dx_j = h[..., self.dim_hidden + self.dim_edge :]
        msg = dx_i + dx_j  # (S, E, H)
        msg = msg * edge_mask[..., None].astype(msg.dtype)

        def scatter_one(m, d):
            return ops.segment_sum(m, d, num_segments=O)

        agg = jax.vmap(scatter_one)(msg, dst)  # (S, O, H)
        new_x = MLP((self.dim_hidden, self.dim_node), do_bn=self.use_bn, name="nn2")(
            agg, mask=obj_mask, train=train
        )
        return new_x, new_e


class TripletGCN(nn.Module):
    """Stack of TripletGCN layers (reference TripletGCNModel :61-80)."""

    num_layers: int = 2
    dim_node: int = 256
    dim_edge: int = 256
    dim_hidden: int = 512

    @nn.compact
    def __call__(self, x, edge_feature, edge_index, obj_mask, edge_mask, train: bool = True):
        for i in range(self.num_layers):
            x, edge_feature = TripletGCNLayer(
                self.dim_node, self.dim_edge, self.dim_hidden, name=f"layer_{i}"
            )(x, edge_feature, edge_index, obj_mask, edge_mask, train=train)
            if i < self.num_layers - 1:
                x = nn.relu(x)
                edge_feature = nn.relu(edge_feature)
        return x, edge_feature
