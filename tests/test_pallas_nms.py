"""Pallas greedy-NMS kernel: interpret-mode parity vs the TF-semantics oracle."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from tpudet.ops.pallas.nms_kernel import batched_greedy_nms_pallas
import oracles


@pytest.mark.parametrize("seed", [0, 1])
def test_kernel_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    b, n = 3, 200
    yx = rng.uniform(0, 100, (n, 2))
    hw = rng.uniform(5, 40, (n, 2))
    boxes = np.concatenate([yx - hw / 2, yx + hw / 2], -1).astype(np.float32)
    scores = rng.uniform(0, 1, (b, n)).astype(np.float32)
    active = rng.uniform(size=(b, n)) < 0.7
    scores_m = np.where(active, scores, -1e30).astype(np.float32)
    num_select = np.asarray([5, 17, 200], np.int32)

    sel, valid = batched_greedy_nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores_m), jnp.asarray(num_select),
        max_out=32, iou_threshold=0.5, interpret=True)
    sel, valid = np.asarray(sel), np.asarray(valid)
    for i in range(b):
        keep = active[i]
        want = oracles.tf_nms(boxes[keep], scores[i][keep],
                              min(int(num_select[i]), 32), 0.5)
        want_global = np.where(keep)[0][want]
        got = sel[i][valid[i]]
        np.testing.assert_array_equal(got, want_global)


def test_xbatch_matches_perimage_kernel():
    """The cross-batch (lockstep) kernel must select exactly what the original
    one-image-per-program kernel selects."""
    from tpudet.ops.pallas.nms_kernel import _pallas_per_image

    rng = np.random.default_rng(7)
    b, n = 5, 300
    yx = rng.uniform(0, 100, (b, n, 2))
    hw = rng.uniform(5, 40, (b, n, 2))
    boxes = np.concatenate([yx - hw / 2, yx + hw / 2], -1).astype(np.float32)
    scores = rng.uniform(0, 1, (b, n)).astype(np.float32)
    num_select = np.asarray([0, 3, 40, 300, 17], np.int32)

    a = batched_greedy_nms_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                  jnp.asarray(num_select), max_out=48,
                                  iou_threshold=0.5, interpret=True)
    p = _pallas_per_image(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.asarray(num_select), max_out=48,
                          iou_threshold=0.5, interpret=True)
    for got, want in zip(a, p):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pretopk_matches_full_kernel():
    """The pre-top-k pool wrapper must reproduce the full-width kernel exactly
    on scenes where no image's pool can exhaust (the common case)."""
    from tpudet.ops.pallas.nms_kernel import batched_greedy_nms_pretopk

    rng = np.random.default_rng(11)
    b, n = 4, 1600  # n > pool (= 2*max_out = 512 min -> 512 here)
    yx = rng.uniform(0, 400, (n, 2))
    hw = rng.uniform(5, 40, (n, 2))
    boxes = np.concatenate([yx - hw / 2, yx + hw / 2], -1).astype(np.float32)
    scores = rng.uniform(0, 1, (b, n)).astype(np.float32)
    active = rng.uniform(size=(b, n)) < 0.5
    scores_m = np.where(active, scores, -1e30).astype(np.float32)
    num_select = np.asarray([3, 25, 90, 0], np.int32)

    fast = batched_greedy_nms_pretopk(
        jnp.asarray(boxes), jnp.asarray(scores_m), jnp.asarray(num_select),
        max_out=96, iou_threshold=0.5, interpret=True)
    full = batched_greedy_nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores_m), jnp.asarray(num_select),
        max_out=96, iou_threshold=0.5, interpret=True)
    for got, want in zip(fast, full):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pretopk_exhaustion_falls_back():
    """A pool-exhausting scene (one cluster of mutually-overlapping top-scored
    boxes swallows the whole pool before the quota fills, while better-late
    candidates sit outside the pool) must detect inexactness and return the
    full-width result."""
    from tpudet.ops.pallas.nms_kernel import batched_greedy_nms_pretopk

    rng = np.random.default_rng(13)
    n = 1200  # pool = 1024 (2*512)
    # 1100 near-identical high-scored boxes (one giant overlap cluster): the
    # first pick suppresses ~the whole pool. 100 disjoint low-scored boxes
    # (fall outside the top-1024 pool) are what exact NMS keeps selecting.
    boxes = np.zeros((n, 4), np.float32)
    boxes[:1100] = [50, 50, 90, 90] + rng.uniform(-0.5, 0.5, (1100, 4)).astype(np.float32)
    for k in range(100):
        y, x = divmod(k, 10)
        boxes[1100 + k] = [200 + 50 * y, 200 + 50 * x,
                           230 + 50 * y, 230 + 50 * x]
    scores = np.zeros((1, n), np.float32)
    scores[0, :1100] = rng.uniform(0.8, 1.0, 1100)
    scores[0, 1100:] = rng.uniform(0.1, 0.2, 100)
    num_select = np.asarray([60], np.int32)

    got = batched_greedy_nms_pretopk(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(num_select),
        max_out=512, iou_threshold=0.5, interpret=True)
    want = batched_greedy_nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(num_select),
        max_out=512, iou_threshold=0.5, interpret=True)
    # exact NMS picks 1 cluster box + 59 of the disjoint tail; the pool only
    # contains cluster boxes, so without the fallback the result would stop at 1
    assert int(np.asarray(want[1]).sum()) == 60
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_zero_area_boxes_terminate():
    # degenerate boxes must not be re-selected forever (NaN IoU guard)
    boxes = np.zeros((4, 4), np.float32)
    scores = np.asarray([[0.9, 0.8, 0.7, 0.6]], np.float32)
    sel, valid = batched_greedy_nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray([4], np.int32),
        max_out=4, iou_threshold=0.5, interpret=True)
    got = np.asarray(sel)[0][np.asarray(valid)[0]]
    assert len(set(got.tolist())) == len(got)  # no duplicates


@pytest.fixture
def pcnms_env():
    old = os.environ.get("TPUDET_PCNMS_IMPL")
    yield os.environ
    if old is None:
        os.environ.pop("TPUDET_PCNMS_IMPL", None)
    else:
        os.environ["TPUDET_PCNMS_IMPL"] = old


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_per_class_nms_batched_matches_vmap(pcnms_env, seed):
    """The inference decode's class-lockstep path (TPU default since round 5)
    must agree with the original per-class vmapped formulation on every valid
    selection (boxes, scores, order)."""
    from tpudet.ops import nms

    rng = np.random.default_rng(seed)
    n, c, max_out = 400, 7, 12
    yx = rng.uniform(0, 80, (n, 2))
    hw = rng.uniform(4, 40, (n, 2))
    boxes = jnp.asarray(
        np.concatenate([yx - hw / 2, yx + hw / 2], -1).astype(np.float32))
    scores = jnp.asarray(rng.uniform(0, 1, (c, n)).astype(np.float32))
    class_active = jnp.asarray(rng.uniform(0, 1, (n,)) > 0.2)

    outs = {}
    for impl in ("vmap", "batched"):
        pcnms_env["TPUDET_PCNMS_IMPL"] = impl
        outs[impl] = nms.per_class_nms(boxes, scores, 0.35, 64, max_out, 0.5,
                                       class_active=class_active)
    bv, sv, vv, _ = outs["vmap"]
    bb, sb, vb, trunc_b = outs["batched"]
    np.testing.assert_array_equal(np.asarray(vv), np.asarray(vb))
    assert not bool(trunc_b)  # the batched path is exact by construction
    mask = np.asarray(vv)
    np.testing.assert_allclose(np.asarray(sv)[mask], np.asarray(sb)[mask],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bv)[mask], np.asarray(bb)[mask],
                               rtol=1e-6)
