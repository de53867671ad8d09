"""Device mesh + sharding helpers.

The reference has no distributed execution at all (SURVEY.md §2c — single
CUDA/CPU device chosen at import).  The TPU-native framework ships
batch-data-parallel training over an ICI mesh as the default strategy:
parameters replicated, batches sharded on a 'data' axis, gradient psum
inserted by XLA under jit.  The mesh keeps a 'model' axis so tensor-parallel
shardings can be layered in without API changes (both networks here are far
below the size where TP pays for itself).
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
    if n_data is None:
        n_data = len(devices) // n_model
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
