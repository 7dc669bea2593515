"""Runtime subsystem tests: config validation, summary writer (TF cross-check),
optimizers, mesh helpers, checkpoint resolution."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpudet.runtime import checkpoint, config as config_lib, mesh, optim, summary


class TestConfig:
    def test_valid_common(self):
        c = config_lib.validate({"mode": "train", "data_format": "channels_last",
                                 "num_classes": 20, "batch_size": 8})
        assert c.mode == "train"

    def test_missing_key(self):
        with pytest.raises(KeyError):
            config_lib.validate({"mode": "train"})

    def test_bad_mode(self):
        with pytest.raises(ValueError):
            config_lib.validate({"mode": "evaluate", "data_format": "channels_last",
                                 "num_classes": 20, "batch_size": 8})

    def test_model_specific(self):
        with pytest.raises(KeyError):
            config_lib.validate({"mode": "train", "data_format": "channels_last",
                                 "num_classes": 20, "batch_size": 8}, "LHRCNN")


class TestSummaryWriter:
    def test_tf_reads_our_events(self, tmp_path):
        tf = pytest.importorskip("tensorflow")
        from tpudet.data import tfrecord as tfr

        logdir = str(tmp_path / "logs")
        w = summary.SummaryWriter(logdir)
        w.add_scalar("loss", 1.5, 1)
        w.add_scalar("loss", 0.75, 2)
        w.close()
        fname = [f for f in os.listdir(logdir) if f.startswith("events")][0]
        # read framing with our own reader (graph-mode-safe if another test has
        # called tf.compat.v1.disable_v2_behavior), parse with TF's Event proto
        records = tfr.read_records(os.path.join(logdir, fname), verify=True)
        events = [tf.compat.v1.Event.FromString(r) for r in records]
        assert events[0].file_version == "brain.Event:2"
        assert events[1].summary.value[0].tag == "loss"
        assert abs(events[1].summary.value[0].simple_value - 1.5) < 1e-6
        assert events[2].step == 2


class TestOptim:
    def test_momentum_matches_tf_semantics(self):
        opt = optim.Momentum(0.9)
        p = {"w": jnp.asarray([1.0, 2.0])}
        g = {"w": jnp.asarray([0.1, -0.2])}
        s = opt.init(p)
        p1, s1 = opt.update(g, s, p, 0.5)
        np.testing.assert_allclose(np.asarray(p1["w"]), [1 - 0.5 * 0.1, 2 + 0.5 * 0.2])
        p2, s2 = opt.update(g, s1, p1, 0.5)
        # accum = 0.9*g + g = 1.9g
        np.testing.assert_allclose(np.asarray(s2.velocity["w"]),
                                   np.asarray(g["w"]) * 1.9, rtol=1e-6)

    def test_adam_moves_toward_minimum(self):
        opt = optim.Adam()
        p = {"w": jnp.asarray([4.0])}
        s = opt.init(p)
        for _ in range(50):
            g = {"w": 2 * p["w"]}
            p, s = opt.update(g, s, p, 0.3)
        assert abs(float(p["w"][0])) < 1.0


class TestMesh:
    def test_eight_device_mesh(self):
        m = mesh.data_mesh()
        assert m.shape["data"] == 8

    def test_shard_and_replicate(self):
        m = mesh.data_mesh()
        x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
        dx = mesh.shard_batch(m, x)
        np.testing.assert_allclose(np.asarray(dx), x)
        t = mesh.replicate_tree(m, {"a": np.ones(3)})
        np.testing.assert_allclose(np.asarray(t["a"]), 1.0)


class TestCheckpoint:
    def test_prefix_resolution_latest(self, tmp_path):
        base = str(tmp_path / "m" / "ckpt")
        checkpoint.save_state(base, {"x": np.ones(2)}, 10)
        checkpoint.save_state(base, {"x": np.full(2, 2.0)}, 20)
        blob = checkpoint.load_state(base)
        np.testing.assert_allclose(blob["x"], 2.0)
        blob10 = checkpoint.load_state(base + "-10")
        np.testing.assert_allclose(blob10["x"], 1.0)
