"""Device mesh + data-parallel sharding.

The genuinely new layer vs the reference (SURVEY.md §2.5): the reference is strictly
single-device (`tf.InteractiveSession`, device picked by CUDA_VISIBLE_DEVICES). Here
training scales over a 1-D ``jax.sharding.Mesh`` across ICI: the batch is sharded over
the ``'data'`` axis, parameters are replicated, and XLA inserts the gradient
all-reduce. Axis names are kept open for future ``('data', 'model')`` 2-D meshes
(nothing precludes TP/PP; the detector zoo doesn't need them — largest model is VGG-16).

A ``'dcn'`` (multi-slice) outer axis can be prepended by passing ``dcn_size`` once
multi-slice environments are available; single-slice keeps the mesh 1-D so collectives
ride ICI only.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the default backend's devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def usable_data_parallelism(batch_size: int, mesh: Mesh) -> int:
    """Largest device count along 'data' that evenly divides the batch."""
    n = mesh.shape[DATA_AXIS]
    while batch_size % n:
        n -= 1
    return n


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host arrays with the batch axis sharded over the mesh."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_tree(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
