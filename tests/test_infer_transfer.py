"""test_one_image's lossless uint8 transfer fast path (round-5).

Integral 0..255 float images ride the wire as uint8 and are cast back to f32 on
device — the results must be BIT-IDENTICAL to feeding the f32 array directly,
and non-integral inputs must keep the f32 path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.ssd import SSD300


class TinySSD(SSD300):
    input_size = 64


def _model():
    cfg = {"mode": "test", "data_format": "channels_last", "num_classes": 20,
           "weight_decay": 1e-4, "keep_prob": 0.5, "batch_size": 1,
           "nms_score_threshold": 0.05, "nms_max_boxes": 8,
           "nms_iou_threshold": 0.45, "pretraining_weight": None}
    return TinySSD(cfg, None)


def test_uint8_path_bit_exact():
    m = _model()
    rng = np.random.default_rng(0)
    img = np.floor(rng.uniform(0, 256, (1, 64, 64, 3))).astype(np.float32)

    got = m.test_one_image(img)  # integral -> uint8 wire path
    want = jax.device_get(m._infer_at(m._base_pre_topk)(
        m.params, m.batch_stats, jnp.asarray(img)))  # f32 direct
    w_scores, w_boxes, w_cid, w_valid, _ = want
    np.testing.assert_array_equal(got[0], w_scores[w_valid])
    np.testing.assert_array_equal(got[1], w_boxes[w_valid])
    np.testing.assert_array_equal(got[2], w_cid[w_valid])


def test_non_integral_keeps_f32(monkeypatch):
    m = _model()
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)  # non-integral
    seen = {}
    orig = m._infer_at

    def spy(pre_topk):
        fn = orig(pre_topk)

        def wrapped(params, bstats, images):
            seen["dtype"] = images.dtype
            return fn(params, bstats, images)

        return wrapped

    monkeypatch.setattr(m, "_infer_at", spy)
    m.test_one_image(img)
    assert seen["dtype"] == jnp.float32

    img2 = np.floor(img)  # integral -> uint8 wire
    m.test_one_image(img2)
    assert seen["dtype"] == jnp.uint8
