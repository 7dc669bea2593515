"""Device mesh + data-parallel sharding.

The genuinely new layer vs the reference (SURVEY.md §2.5): the reference is strictly
single-device (`tf.InteractiveSession`, device picked by CUDA_VISIBLE_DEVICES). Here
training scales over a 1-D ``jax.sharding.Mesh`` across ICI: the batch is sharded over
the ``'data'`` axis, parameters are replicated, and XLA inserts the gradient
all-reduce. Axis names are kept open for future ``('data', 'model')`` 2-D meshes
(nothing precludes TP/PP; the detector zoo doesn't need them — largest model is VGG-16).

A ``'dcn'`` (multi-slice / multi-host) outer axis is prepended by passing
``dcn_size`` (or automatically when ``jax.process_count() > 1``): devices are grouped
so the ``'dcn'`` axis crosses hosts/slices (its collectives ride DCN) and the
``'data'`` axis stays within a slice (its collectives ride ICI). Single-slice keeps
the mesh 1-D. Multi-process feeding goes through ``shard_batch`` — each process
passes its LOCAL batch rows (the per-host pipeline shard, pipeline.py
``shard_index``/``num_shards``) and the global array is assembled with
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DCN_AXIS = "dcn"


def data_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              dcn_size: Optional[int] = None) -> Mesh:
    """Data-parallel mesh: 1-D ``('data',)`` single-slice, 2-D ``('dcn', 'data')``
    when ``dcn_size > 1`` (defaults to ``jax.process_count()``)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if dcn_size is None:
        dcn_size = jax.process_count() if jax.process_count() > 1 else 1
    if dcn_size <= 1:
        return Mesh(np.asarray(devices), (DATA_AXIS,))
    if len(devices) % dcn_size:
        raise ValueError(
            f"{len(devices)} devices do not divide into dcn_size={dcn_size} groups")
    # rows = hosts/slices (ordered by process), columns = devices within a slice,
    # so 'data' collectives stay on ICI and only 'dcn' collectives cross DCN
    devs = sorted(devices, key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devs).reshape(dcn_size, -1), (DCN_AXIS, DATA_AXIS))


def batch_axes(mesh: Mesh) -> tuple:
    """Mesh axes the batch dimension is sharded over (dcn outermost)."""
    return tuple(a for a in (DCN_AXIS, DATA_AXIS) if a in mesh.axis_names)


def data_parallel_size(mesh: Mesh) -> int:
    """Total way-ness of batch sharding (product over dcn and data axes)."""
    return int(np.prod([mesh.shape[a] for a in batch_axes(mesh)]))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data-parallel axes."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host batches with the leading axis sharded over the mesh.

    Single-process: ``arrays`` are the full global batch. Multi-process: each
    process passes only its LOCAL rows (the per-host input shard) and the global
    array is assembled across hosts without any data movement."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        out = tuple(jax.make_array_from_process_local_data(sh, np.asarray(a))
                    for a in arrays)
    else:
        out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_tree(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh (every host must hold
    the same values — true for seeded init and loaded checkpoints)."""
    sh = replicated(mesh)
    if jax.process_count() > 1:
        def put(a):
            a = np.asarray(a)
            return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])
        return jax.tree.map(put, tree)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
