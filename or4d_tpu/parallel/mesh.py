"""Device mesh construction and SceneBatch sharding rules."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, mp: int = 1, devices=None) -> Mesh:
    """Build a ('dp', 'mp') mesh. dp=-1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp == -1:
        if n % mp:
            raise ValueError(f"{n} devices not divisible by mp={mp}")
        dp = n // mp
    if dp * mp > n:
        raise ValueError(f"mesh {dp}x{mp} needs {dp*mp} devices, have {n}")
    arr = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, axis_names=("dp", "mp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> list:
    """Shardings for SceneBatch children in tree_flatten order
    (scene_batch._ARRAY_FIELDS then images): scene axis over 'dp',
    object/edge slot axes over 'mp'."""

    def nd(*spec):
        return NamedSharding(mesh, P(*spec))

    dm = nd("dp", "mp")
    return [dm, dm, dm, dm, dm, dm, dm, dm, dm, nd("dp")]


def shard_batch(batch, mesh: Mesh):
    """Device-put a host SceneBatch onto the mesh with the standard rule.

    jit then infers input shardings from the committed arrays, sidestepping
    pytree aux-data mismatches between batches (scan ids differ per batch).
    """
    import jax.tree_util as jtu

    dp = mesh.shape["dp"]
    if batch.num_scenes % dp:
        batch = batch.pad_scenes(dp)
    children, treedef = jtu.tree_flatten(batch, is_leaf=lambda x: x is None)
    shardings = batch_sharding(mesh)
    placed = [
        x if x is None else jax.device_put(x, s)
        for x, s in zip(children, shardings[: len(children)])
    ]
    return jtu.tree_unflatten(treedef, placed)
