"""Shims for executing the TF1 reference under tf.compat.v1: a fake
pywrap_tensorflow.NewCheckpointReader supplying random VGG-16 conv tensors
(no vgg_16.ckpt ships in this environment; loss/decode parity is weight-agnostic
because the harnesses override the head tensors)."""

import numpy as np

_VGG_SHAPES = {}
_prev = 3
for _block, (_width, _reps) in enumerate(
        [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)], start=1):
    for _i in range(1, _reps + 1):
        _VGG_SHAPES[f"vgg_16/conv{_block}/conv{_block}_{_i}/weights"] = \
            (3, 3, _prev, _width)
        _VGG_SHAPES[f"vgg_16/conv{_block}/conv{_block}_{_i}/biases"] = (_width,)
        _prev = _width


class _FakeReader:
    def get_tensor(self, name):
        rng = np.random.default_rng(abs(hash(name)) % 2**32)
        return rng.normal(0, 0.01, _VGG_SHAPES[name]).astype(np.float32)


def NewCheckpointReader(path):
    return _FakeReader()
