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
      images: ``[N, H, W, 3]`` uint8 (array or memmap).
      gt: ``[N, P, 5]`` float32 padded ground truth.
      batch: batch size.
      seed: shuffle seed.
      max_bytes: HBM budget for the image cache. If the dataset exceeds it, a
        random ``seed``-deterministic subset is cached instead (and a note is
        printed) — the convergence protocol prefers a smaller resident set over a
        4x slower streamed feed.
    """

    def __init__(self, images, gt, batch: int, seed: int = 0,
                 max_bytes: Optional[int] = None):
        n = images.shape[0]
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
        self.images = jax.device_put(np.ascontiguousarray(images, np.uint8))
        self.gt = jax.device_put(np.ascontiguousarray(gt, np.float32))

        def gather(imgs, gt_, idx):
            return jnp.take(imgs, idx, 0), jnp.take(gt_, idx, 0)

        self._gather = jax.jit(gather)
        self._order = np.arange(self.n)
        self._pos = self.n  # trigger shuffle on first batch

    def __iter__(self):
        return self

    def next_indices(self, k: int) -> np.ndarray:
        """Advance the shuffle stream by ``k`` batches and return their indices as
        ``[k, batch]`` int32 — the host half of the feed. A caller can run all k
        steps in ONE device dispatch (gather + step inside a ``lax.scan``), which
        amortizes the per-dispatch tunnel round-trip (DetectorBase.train_one_epoch
        does this automatically for device-resident feeds)."""
        out = np.empty((k, self.batch), np.int32)
        for i in range(k):
            if self._pos + self.batch > self.n:
                self.rng.shuffle(self._order)
                self._pos = 0
            out[i] = self._order[self._pos:self._pos + self.batch]
            self._pos += self.batch
        return out

    def __next__(self) -> Tuple[jax.Array, jax.Array]:
        idx = self.next_indices(1)[0]
        return self._gather(self.images, self.gt, jnp.asarray(idx, jnp.int32))

    def reset(self):  # reference initializer contract: reshuffle + restart
        self._pos = self.n

    def close(self):
        pass
