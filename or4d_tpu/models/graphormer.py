"""Graphormer — transformer over scene-graph tracks for clinical role
prediction, TPU-native.

Reference: `role_prediction/graphormer/model.py` (role_prediction branch):
  * vocab: node ids embed into (30, H) table, edge types (5, heads),
    spatial positions (64, heads), in/out degrees (64, H), all padding_idx 0;
  * graph-structural attention bias: spatial-position bias + multi-hop edge
    encoding (per-distance head-mixing matmuls, :159-177) + virtual-token
    distance, added to every layer's attention logits;
  * a batch is one TRACK = many graphs (collator.py:94-148); padded graphs /
    nodes are masked through the collator's -inf attention bias;
  * pre-LN encoder layers (hidden 80, ffn 80, 8 heads, 12 layers);
  * role readout: mean over TARGET-node embeddings across the whole track
    -> 5-way linear (:211-219); CE loss; temperature-4 softmax scoring at
    eval (role_prediction_helpers.py:161).

TPU design: static (G, N+1) shapes (G = padded track length, N = 64 max
nodes); all graphs of the track process as one batched attention call. Init
matches the reference (normal 0.02/sqrt(n_layers) linears, 0.02 embeddings).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e9  # stands in for the collator's float('-inf') without NaN risk

ROLE_NAMES = ["Patient", "head_surgeon", "assistant_surgeon", "circulating_nurse", "anaesthetist"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GraphormerBatch:
    """One padded track (all arrays leading dim G = graphs in the track).

    Field semantics follow the reference collator (+1 pad offsets applied):
      x            (G, N)         node ids, 0 = padding
      attn_bias    (G, N+1, N+1)  0 or NEG_INF (spatial_pos_max + padding)
      spatial_pos  (G, N, N)      shortest-path buckets, 0 = padding
      in_degree    (G, N)         0 = padding
      out_degree   (G, N)
      edge_input   (G, N, N, D)   multi-hop edge type ids, 0 = padding
      is_target    (G, N)         0 pad / 1 non-target / 2 TARGET node
    """

    x: Any
    attn_bias: Any
    spatial_pos: Any
    in_degree: Any
    out_degree: Any
    edge_input: Any
    is_target: Any


def _init_linear(n_layers: int):
    return nn.initializers.normal(stddev=0.02 / math.sqrt(n_layers))


_EMB_INIT = nn.initializers.normal(stddev=0.02)


class MultiHeadAttention(nn.Module):
    hidden: int
    heads: int
    dropout: float
    n_layers: int

    @nn.compact
    def __call__(self, x, attn_bias, train: bool = True):
        d = self.hidden // self.heads
        dense = lambda name: nn.Dense(self.heads * d, kernel_init=_init_linear(self.n_layers), name=name)
        G, T, _ = x.shape
        q = dense("q")(x).reshape(G, T, self.heads, d)
        k = dense("k")(x).reshape(G, T, self.heads, d)
        v = dense("v")(x).reshape(G, T, self.heads, d)
        logits = jnp.einsum("gthd,gshd->ghts", q, k) * (d**-0.5)
        if attn_bias is not None:
            logits = logits + attn_bias
        probs = jax.nn.softmax(logits, axis=-1)
        probs = nn.Dropout(self.dropout, deterministic=not train)(probs)
        out = jnp.einsum("ghts,gshd->gthd", probs, v).reshape(G, T, self.heads * d)
        return nn.Dense(self.hidden, kernel_init=_init_linear(self.n_layers), name="out")(out)


class EncoderLayer(nn.Module):
    hidden: int
    ffn: int
    heads: int
    dropout: float
    attn_dropout: float
    n_layers: int

    @nn.compact
    def __call__(self, x, attn_bias, train: bool = True):
        y = nn.LayerNorm(name="attn_norm")(x)
        y = MultiHeadAttention(self.hidden, self.heads, self.attn_dropout, self.n_layers, name="attn")(y, attn_bias, train)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        x = x + y
        y = nn.LayerNorm(name="ffn_norm")(x)
        y = nn.Dense(self.ffn, kernel_init=_init_linear(self.n_layers), name="ffn1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.hidden, kernel_init=_init_linear(self.n_layers), name="ffn2")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return x + y


class Graphormer(nn.Module):
    num_classes: int = 5
    n_layers: int = 12
    hidden: int = 80
    ffn: int = 80
    heads: int = 8
    dropout: float = 0.1
    attn_dropout: float = 0.1
    input_dropout: float = 0.1
    multi_hop_max_dist: int = 5
    num_node_types: int = 30
    num_edge_types: int = 5
    num_spatial: int = 64
    num_degree: int = 64

    @nn.compact
    def __call__(self, batch: GraphormerBatch, train: bool = True, perturb=None):
        G, N = batch.x.shape
        H = self.heads
        emb = lambda n, d, name: nn.Embed(n, d, embedding_init=_EMB_INIT, name=name)

        atom_encoder = emb(self.num_node_types, self.hidden, "atom_encoder")
        edge_encoder = emb(self.num_edge_types, H, "edge_encoder")
        spatial_encoder = emb(self.num_spatial, H, "spatial_pos_encoder")
        in_deg_enc = emb(self.num_degree, self.hidden, "in_degree_encoder")
        out_deg_enc = emb(self.num_degree, self.hidden, "out_degree_encoder")
        edge_dis_encoder = self.param("edge_dis_encoder", _EMB_INIT, (40 * H * H, 1))
        graph_token = self.param("graph_token", _EMB_INIT, (1, self.hidden))
        graph_token_dist = self.param("graph_token_virtual_distance", _EMB_INIT, (1, H))

        # ---- attention bias (G, H, N+1, N+1)
        bias = jnp.repeat(batch.attn_bias[:, None, :, :], H, axis=1)
        spatial_bias = jnp.transpose(spatial_encoder(batch.spatial_pos), (0, 3, 1, 2))
        bias = bias.at[:, :, 1:, 1:].add(spatial_bias)
        t = graph_token_dist.reshape(1, H, 1)
        bias = bias.at[:, :, 1:, 0].add(t)
        bias = bias.at[:, :, 0, :].add(t[..., None, :].reshape(1, H, 1))

        # ---- multi-hop edge encoding (model.py:159-177)
        sp = batch.spatial_pos
        sp = jnp.where(sp == 0, 1, sp)
        sp = jnp.where(sp > 1, sp - 1, sp)
        sp = jnp.clip(sp, 0, self.multi_hop_max_dist)
        D = min(batch.edge_input.shape[3], self.multi_hop_max_dist)
        ei = batch.edge_input[:, :, :, :D]
        ei = edge_encoder(ei)  # (G, N, N, D, H) — feature dim already merged
        # per-distance head mixing: (D, G*N*N, H) @ (D, H, H)
        flat = jnp.transpose(ei, (3, 0, 1, 2, 4)).reshape(D, -1, H)
        mix = edge_dis_encoder.reshape(-1, H, H)[:D]
        flat = jnp.einsum("dbh,dhk->dbk", flat, mix)
        ei = flat.reshape(D, G, N, N, H)
        ei = jnp.sum(ei, axis=0) / sp[..., None].astype(jnp.float32)  # (G, N, N, H)
        bias = bias.at[:, :, 1:, 1:].add(jnp.transpose(ei, (0, 3, 1, 2)))

        bias = bias + batch.attn_bias[:, None, :, :]  # "reset" add of the mask

        # ---- node features + graph token
        node = atom_encoder(batch.x)
        if perturb is not None:
            node = node + perturb  # FLAG adversarial perturbation (flag.py)
        node = node + in_deg_enc(batch.in_degree) + out_deg_enc(batch.out_degree)
        tok = jnp.broadcast_to(graph_token[None], (G, 1, self.hidden))
        h = jnp.concatenate([tok, node], axis=1)
        h = nn.Dropout(self.input_dropout, deterministic=not train)(h)

        for i in range(self.n_layers):
            h = EncoderLayer(self.hidden, self.ffn, self.heads, self.dropout, self.attn_dropout, self.n_layers, name=f"layer_{i}")(h, bias, train)
        h = nn.LayerNorm(name="final_ln")(h)

        # ---- role readout: masked mean over TARGET nodes across the track
        target = jnp.concatenate(
            [jnp.ones((G, 1), batch.is_target.dtype), batch.is_target], axis=1
        )  # graph token column counts as non-target (value 1)
        tmask = (target == 2).astype(jnp.float32)[..., None]
        count = jnp.maximum(jnp.sum(tmask), 1.0)
        pooled = jnp.sum(h * tmask, axis=(0, 1)) / count  # (hidden,)
        logits = nn.Dense(self.num_classes, kernel_init=_init_linear(self.n_layers), name="downstream_out_proj")(pooled)
        return logits
