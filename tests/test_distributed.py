"""Distributed-on-CPU tests (SURVEY.md §4): the 8-device data-parallel train step
must produce the same loss and parameters as the single-device step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpudet.runtime import mesh as mesh_lib


def _build(batch, num_devices):
    from tpudet.models.ssd import SSD300

    class SSD64(SSD300):
        input_size = 64

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, (batch, 64, 64, 3)).astype(np.float32)
    gt = -np.ones((batch, 8, 5), np.float32)
    gt[:, 0] = [32, 32, 20, 24, 1]
    gt[:, 1] = [16, 48, 12, 12, 3]

    def batches():
        while True:
            yield images, gt

    config = {
        "mode": "train", "data_format": "channels_last", "num_classes": 4,
        "weight_decay": 1e-4, "keep_prob": 1.0, "batch_size": batch,
        "nms_score_threshold": 0.3, "nms_max_boxes": 5, "nms_iou_threshold": 0.45,
        "pretraining_weight": None, "hard_neg_cap": 48, "seed": 7,
    }
    provider = {"data_shape": [64, 64, 3], "num_train": batch, "num_val": 0,
                "train_generator": (lambda: None, batches()), "val_generator": None}
    model = SSD64(config, provider)
    # force the mesh size under test
    model.mesh = mesh_lib.data_mesh(num_devices=num_devices)
    model.params = mesh_lib.replicate_tree(model.mesh, model.params)
    model.batch_stats = mesh_lib.replicate_tree(model.mesh, model.batch_stats)
    model.opt_state = mesh_lib.replicate_tree(model.mesh, model.opt_state)
    return model


def test_dp8_matches_single_device():
    assert len(jax.devices()) >= 8
    m1 = _build(8, 1)
    m8 = _build(8, 8)
    assert m8.mesh.shape["data"] == 8

    l1 = m1.train_one_epoch(0.01)
    l8 = m8.train_one_epoch(0.01)
    np.testing.assert_allclose(l1, l8, rtol=2e-4)

    p1 = jax.tree.leaves(m1.params)
    p8 = jax.tree.leaves(m8.params)
    worst = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                for a, b in zip(p1, p8))
    assert worst < 5e-4, worst


def test_batch_actually_sharded():
    m8 = _build(8, 8)
    images = np.zeros((8, 64, 64, 3), np.float32)
    gt = -np.ones((8, 8, 5), np.float32)
    di, _ = m8._to_device(images, gt)
    shard_shapes = {s.data.shape for s in di.addressable_shards}
    assert shard_shapes == {(1, 64, 64, 3)}
