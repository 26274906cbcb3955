"""Device mesh + data-parallel sharding helpers.

The reference's one parallelism strategy is single-process multi-GPU
DataParallel (train_bid_pointconv.py:98-102; SURVEY.md §2.4). The TPU-native
equivalent: a 1-D `data` mesh; batches sharded over it, parameters
replicated; XLA inserts the psum gradient all-reduce over ICI when the jitted
train step differentiates a mean loss over the global batch.

The mesh axis is named "data" and kept 1-D by default — at this model size
(<8M params) there is no model-parallel requirement; multi-slice DCN data
parallelism composes by enlarging the same axis.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
