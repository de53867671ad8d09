"""Device mesh + sharding helpers.

The reference has no distributed execution at all (SURVEY.md §2c — single
CUDA/CPU device chosen at import).  The TPU-native framework ships
batch-data-parallel training over an ICI mesh as the default strategy:
parameters replicated, batches sharded on a 'data' axis, gradient psum
inserted by XLA under jit.  The mesh keeps a 'model' axis; the lifter MLP
additionally supports Megatron-style tensor parallelism over it
(``lifter_tp_shardings`` — train_lifter(mesh=make_mesh(n_model=k)) shards
every hidden layer, alternating column/row-parallel).  Both networks are far
below the size where TP pays for itself on real hardware; the layout exists
so the mesh abstraction is exercised end-to-end (SURVEY.md §2c).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults to all devices on the data axis — the right layout for this
    workload (grad psum rides ICI all-reduce).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_model < 1 or n_model > len(devices):
        raise ValueError(f"n_model={n_model} needs 1..{len(devices)} "
                         f"devices (have {len(devices)})")
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data < 1:
        raise ValueError(f"mesh {n_data}x{n_model} is empty for "
                         f"{len(devices)} devices")
    if n_data * n_model < len(devices):
        import sys
        print(f"[mpe3d] mesh {n_data}x{n_model} uses {n_data * n_model} of "
              f"{len(devices)} devices", file=sys.stderr)
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    s = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def pad_to_multiple(x: np.ndarray, multiple: int):
    """Pad the leading axis to a multiple (so it shards evenly); returns
    (padded, real_count)."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = np.zeros((rem, *x.shape[1:]), x.dtype)
    return np.concatenate([x, pad], axis=0), n


def lifter_tp_shardings(mesh: Mesh, params) -> dict:
    """Tensor-parallel shardings for the lifter MLP over the 'model' axis.

    Megatron-style alternation: even layers column-parallel (weight
    [in, out] split on out, bias split), odd layers row-parallel (weight
    split on in, bias replicated) — XLA's SPMD partitioner then inserts
    exactly one all-reduce per row-parallel layer (riding ICI), the
    scaling-book recipe.  Layers whose dims don't divide the axis (the
    54-wide output head) stay replicated.  With ``n_model == 1`` every
    entry is replicated and this is a no-op layout.
    """
    m = mesh.shape["model"]
    layers = []
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        d_in, d_out = layer["w"].shape
        col = i % 2 == 0
        if m == 1 or i == n - 1 or (col and d_out % m) \
                or (not col and d_in % m):
            layers.append({"w": replicated(mesh), "b": replicated(mesh)})
        elif col:
            layers.append({"w": NamedSharding(mesh, P(None, "model")),
                           "b": NamedSharding(mesh, P("model"))})
        else:
            layers.append({"w": NamedSharding(mesh, P("model", None)),
                           "b": replicated(mesh)})
    return {"layers": layers}


def shard_tree(tree, shardings):
    """device_put a pytree with a matching pytree of shardings."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), tree, shardings)
