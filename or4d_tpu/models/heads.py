"""Classifier heads — object and relation predictors.

Reference: `scene_graph_helpers/model/pointnets/network_PointNet.py`:
  * PointNetCls (:188-224): 256 -> 512 -> relu -> 256 -> dropout(0.3) ->
    relu -> num_classes -> log_softmax (batch_norm=False in the paper config);
  * PointNetRelCls (:227-271): same trunk, then late fusion of the 12-d
    subject/object type one-hots (and the 768-d image embedding for the
    multimodal model) before the final Dense -> log_softmax;
  * PointNetRelClsMulti (:274-318): sigmoid multi-label variant.

Heads are initialized xavier-normal like the reference init_weights
('xavier_normal', networks_base).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

_dense = lambda f, name: nn.Dense(f, kernel_init=nn.initializers.xavier_normal(), name=name)


class ObjectClsHead(nn.Module):
    num_classes: int
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.relu(_dense(512, "fc1")(x))
        x = _dense(256, "fc2")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(x)
        x = _dense(self.num_classes, "fc3")(x)
        return nn.log_softmax(x, axis=-1)


class RelationClsHead(nn.Module):
    num_relations: int
    dropout: float = 0.3
    multi_label: bool = False

    @nn.compact
    def __call__(self, x, relation_objects_one_hot=None, image_embeddings=None, train: bool = True):
        x = nn.relu(_dense(512, "fc1")(x))
        x = _dense(256, "fc2")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(x)
        if image_embeddings is not None:  # late fusion (one vector per scene)
            img = jnp.broadcast_to(image_embeddings[..., None, :], x.shape[:-1] + image_embeddings.shape[-1:])
            x = jnp.concatenate([x, img], axis=-1)
        if relation_objects_one_hot is not None:  # late fusion
            x = jnp.concatenate([x, relation_objects_one_hot.astype(x.dtype)], axis=-1)
        x = _dense(self.num_relations, "fc3")(x)
        if self.multi_label:
            return jax.nn.sigmoid(x)
        return nn.log_softmax(x, axis=-1)
