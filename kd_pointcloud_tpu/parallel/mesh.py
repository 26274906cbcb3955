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


def data_parallel_sharding(batch_size: int, logger=None):
    """(mesh, batch sharding-or-None) for the default device set.

    Falls back to single-device placement when the global batch does not
    divide over the mesh (DataParallel's uneven-scatter footgun — here it is
    an explicit, logged decision instead of a wrong-shape crash)."""
    mesh = make_mesh()
    n = len(mesh.devices.flat)
    if n <= 1:
        return mesh, None
    if batch_size % n != 0:
        if logger is not None:
            logger.warning(
                "batch_size %d not divisible by %d devices — running "
                "single-device; pick a divisible batch to enable data "
                "parallelism", batch_size, n)
        return mesh, None
    return mesh, batch_sharding(mesh)


def resolve_global_batch(batch_size: int, per_device: bool,
                         n_devices: Optional[int] = None) -> int:
    """Global batch under the config's batch-size semantics.

    per_device=True scales the configured size by the mesh size, so the
    reference's bs=3 recipe (train_bid_pointconv.yaml) becomes 3/chip on a
    v5e-8 (global 24) instead of wasting 7 of 8 chips. per_device=False
    keeps the reference's global meaning."""
    if not per_device:
        return batch_size
    n = n_devices if n_devices is not None else jax.device_count()
    return batch_size * max(n, 1)


def data_parallel_plan(batch_size: int, logger=None):
    """(mesh, sharding-or-None, padded_batch) for a global batch size.

    Unlike data_parallel_sharding's single-device fallback, a non-divisible
    batch stays DATA-PARALLEL: the step batch is padded (repeat-last, like
    eval's pad_last) up to the next multiple of the mesh and the train step
    masks the pad rows out of the loss via batch["weight"]. padded_batch ==
    batch_size when divisible. Sharding is None only on 1 device."""
    mesh = make_mesh()
    n = len(mesh.devices.flat)
    if n <= 1:
        return mesh, None, batch_size
    padded = ((batch_size + n - 1) // n) * n
    if padded != batch_size and logger is not None:
        logger.info(
            "batch_size %d padded to %d for the %d-device mesh (pad rows "
            "are masked out of the loss); set batch_size_per_device: true "
            "for full utilization", batch_size, padded, n)
    return mesh, batch_sharding(mesh), padded


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
