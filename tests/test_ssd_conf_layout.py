"""The CA-layout conf-loss block (TPUDET_SSD_CONF_LAYOUT=ca) must agree with the
straightforward [A, C] form: same three CE readouts, same total loss, up to fp
reduction order of the 21-term logsumexp. See heads/ssd.py:_conf_ce_terms."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpudet.heads import ssd as ssd_head


@pytest.fixture
def setenv():
    old = os.environ.get("TPUDET_SSD_CONF_LAYOUT")
    yield os.environ
    if old is None:
        os.environ.pop("TPUDET_SSD_CONF_LAYOUT", None)
    else:
        os.environ["TPUDET_SSD_CONF_LAYOUT"] = old


def _data(seed=0, a=977, g=60, c=21):
    rng = np.random.default_rng(seed)
    pconf = jnp.asarray(rng.normal(size=(a, c)).astype(np.float32) * 3)
    best_anchor = jnp.asarray(rng.integers(0, a, (g,)).astype(np.int32))
    g_label = jnp.asarray(rng.integers(0, c, (g,)).astype(np.int32))
    po_label = jnp.asarray(rng.integers(0, c, (a,)).astype(np.int32))
    return pconf, best_anchor, g_label, po_label, c


def test_ca_matches_ac(setenv):
    pconf, best_anchor, g_label, po_label, c = _data()
    setenv["TPUDET_SSD_CONF_LAYOUT"] = "ac"
    ac = ssd_head._conf_ce_terms(pconf, best_anchor, g_label, po_label, c)
    setenv["TPUDET_SSD_CONF_LAYOUT"] = "ca"
    ca = ssd_head._conf_ce_terms(pconf, best_anchor, g_label, po_label, c)
    for t_ac, t_ca, name in zip(ac, ca, ("best_ce", "po_ce", "neg_ce")):
        np.testing.assert_allclose(t_ac, t_ca, rtol=2e-6, atol=2e-6, err_msg=name)


def test_ca_full_loss_and_grad(setenv):
    """End-to-end ssd_loss value AND d(loss)/d(pconf) agree across layouts."""
    rng = np.random.default_rng(1)
    b, a, g, c = 3, 977, 60, 21
    from tpudet.ops import anchors as anchor_ops

    yx = jnp.asarray(rng.uniform(10, 290, (a, 2)).astype(np.float32))
    hw = jnp.asarray(rng.uniform(10, 120, (a, 2)).astype(np.float32))
    anc = ssd_head.AnchorSet(yx, hw, yx - hw / 2, yx + hw / 2)
    pconf = jnp.asarray(rng.normal(size=(b, a, c)).astype(np.float32))
    pyx = jnp.asarray(rng.normal(size=(b, a, 2)).astype(np.float32))
    phw = jnp.asarray(rng.normal(size=(b, a, 2)).astype(np.float32))
    gt = -np.ones((b, g, 5), np.float32)
    for i in range(b):
        for k in range(4):
            h, w = rng.uniform(20, 150, 2)
            gt[i, k] = [rng.uniform(h / 2, 300 - h / 2),
                        rng.uniform(w / 2, 300 - w / 2), h, w,
                        rng.integers(0, c - 1)]
    gt = jnp.asarray(gt)

    def loss_fn(pc):
        return ssd_head.ssd_loss(pc, pyx, phw, anc, gt, c)

    outs = {}
    for layout in ("ac", "ca"):
        setenv["TPUDET_SSD_CONF_LAYOUT"] = layout
        outs[layout] = (loss_fn(pconf), jax.grad(loss_fn)(pconf))
    np.testing.assert_allclose(outs["ac"][0], outs["ca"][0], rtol=1e-5)
    np.testing.assert_allclose(outs["ac"][1], outs["ca"][1], rtol=1e-4, atol=1e-6)


def _gt_batch(rng, b, g, c, frame=300):
    gt = -np.ones((b, g, 5), np.float32)
    for i in range(b):
        for k in range(4):
            h, w = rng.uniform(20, 150, 2)
            gt[i, k] = [rng.uniform(h / 2, frame - h / 2),
                        rng.uniform(w / 2, frame - w / 2), h, w,
                        rng.integers(0, c - 1)]
    return jnp.asarray(gt)


def _anchors(rng, a):
    yx = jnp.asarray(rng.uniform(10, 290, (a, 2)).astype(np.float32))
    hw = jnp.asarray(rng.uniform(10, 120, (a, 2)).astype(np.float32))
    return ssd_head.AnchorSet(yx, hw, yx - hw / 2, yx + hw / 2)


def test_retina_focal_ca_matches_ac(setenv):
    from tpudet.heads import retina as retina_head

    rng = np.random.default_rng(2)
    b, a, g, c = 3, 977, 60, 21
    anc = _anchors(rng, a)
    pconf = jnp.asarray(rng.normal(size=(b, a, c)).astype(np.float32))
    pyx = jnp.asarray(rng.normal(size=(b, a, 2)).astype(np.float32))
    phw = jnp.asarray(rng.normal(size=(b, a, 2)).astype(np.float32))
    gt = _gt_batch(rng, b, g, c)

    def loss_fn(pc):
        return retina_head.retina_loss(pc, pyx, phw, anc, gt, c, 0.25, 2.0)

    outs = {}
    for layout in ("ac", "ca"):
        setenv["TPUDET_SSD_CONF_LAYOUT"] = layout
        outs[layout] = (loss_fn(pconf), jax.grad(loss_fn)(pconf))
    np.testing.assert_allclose(outs["ac"][0], outs["ca"][0], rtol=1e-5)
    np.testing.assert_allclose(outs["ac"][1], outs["ca"][1], rtol=1e-4, atol=1e-6)


def test_refine_loss_ca_matches_ac(setenv):
    from tpudet.heads import refine as refine_head

    rng = np.random.default_rng(3)
    b, a, g, c = 3, 977, 60, 21
    anc = _anchors(rng, a)
    arm_yx = jnp.asarray(rng.normal(size=(b, a, 2)).astype(np.float32) * 0.1)
    arm_hw = jnp.asarray(rng.normal(size=(b, a, 2)).astype(np.float32) * 0.1)
    arm_conf = jnp.asarray(rng.normal(size=(b, a, 2)).astype(np.float32))
    odm_yx = jnp.asarray(rng.normal(size=(b, a, 2)).astype(np.float32) * 0.1)
    odm_hw = jnp.asarray(rng.normal(size=(b, a, 2)).astype(np.float32) * 0.1)
    odm_conf = jnp.asarray(rng.normal(size=(b, a, c)).astype(np.float32))
    gt = _gt_batch(rng, b, g, c)

    def loss_fn(ac_, oc_):
        return refine_head.refine_loss(arm_yx, arm_hw, ac_, odm_yx, odm_hw, oc_,
                                       anc, gt, c)

    outs = {}
    for layout in ("ac", "ca"):
        setenv["TPUDET_SSD_CONF_LAYOUT"] = layout
        outs[layout] = (loss_fn(arm_conf, odm_conf),
                        jax.grad(loss_fn, argnums=(0, 1))(arm_conf, odm_conf))
    np.testing.assert_allclose(outs["ac"][0], outs["ca"][0], rtol=1e-5)
    for g_ac, g_ca in zip(outs["ac"][1], outs["ca"][1]):
        np.testing.assert_allclose(g_ac, g_ca, rtol=1e-4, atol=1e-6)


def test_fcos_loss_ca_matches_ac(setenv):
    from tpudet.heads import fcos as fcos_head

    rng = np.random.default_rng(4)
    b, g, c = 2, 24, 21
    # level shapes for a 128x192 input: strides 8..128
    shapes = [(16, 24), (8, 12), (4, 6), (2, 3), (1, 2)]
    level_preds = []
    for fh, fw in shapes:
        pconf = jnp.asarray(rng.normal(size=(b, fh, fw, c - 1)).astype(np.float32))
        preg = jnp.asarray(np.exp(rng.normal(size=(b, fh, fw, 4))).astype(np.float32))
        pcen = jnp.asarray(rng.normal(size=(b, fh, fw, 1)).astype(np.float32))
        level_preds.append((pconf, preg, pcen))
    gt = -np.ones((b, g, 5), np.float32)
    for i in range(b):
        for k in range(5):
            h, w = rng.uniform(20, 500, 2)
            gt[i, k] = [rng.uniform(h / 2, 1000 - h / 2),
                        rng.uniform(w / 2, 1500 - w / 2), h, w,
                        rng.integers(0, c - 1)]
    gt = jnp.asarray(gt)

    def loss_fn(lp):
        return fcos_head.fcos_loss(lp, gt, c - 1)

    outs = {}
    for layout in ("ac", "ca"):
        setenv["TPUDET_SSD_CONF_LAYOUT"] = layout
        grads = jax.grad(lambda flat: loss_fn(
            [(flat[3 * i], flat[3 * i + 1], flat[3 * i + 2])
             for i in range(len(shapes))]
        ))([t for lvl in level_preds for t in lvl])
        outs[layout] = (loss_fn(level_preds), grads)
    np.testing.assert_allclose(outs["ac"][0], outs["ca"][0], rtol=1e-5)
    for g_ac, g_ca in zip(outs["ac"][1], outs["ca"][1]):
        np.testing.assert_allclose(g_ac, g_ca, rtol=1e-4, atol=1e-6)


def test_centernet_loss_ca_matches_ac(setenv):
    from tpudet.heads import centernet as cn_head

    rng = np.random.default_rng(5)
    b, g, c, h, w = 2, 24, 20, 24, 32
    keyp = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    off = jnp.asarray(rng.normal(size=(b, h, w, 2)).astype(np.float32))
    size = jnp.asarray(np.exp(rng.normal(size=(b, h, w, 2))).astype(np.float32))
    gt = -np.ones((b, g, 5), np.float32)
    for i in range(b):
        for k in range(5):
            bh, bw = rng.uniform(10, 60, 2)
            gt[i, k] = [rng.uniform(bh / 2, 4 * h - bh / 2),
                        rng.uniform(bw / 2, 4 * w - bw / 2), bh, bw,
                        rng.integers(0, c)]
    gt = jnp.asarray(gt)

    def loss_fn(kp, of, sz):
        return cn_head.centernet_loss(kp, of, sz, gt, c)

    outs = {}
    for layout in ("ac", "ca"):
        setenv["TPUDET_SSD_CONF_LAYOUT"] = layout
        outs[layout] = (loss_fn(keyp, off, size),
                        jax.grad(loss_fn, argnums=(0, 1, 2))(keyp, off, size))
    np.testing.assert_allclose(outs["ac"][0], outs["ca"][0], rtol=1e-5)
    for g_ac, g_ca in zip(outs["ac"][1], outs["ca"][1]):
        np.testing.assert_allclose(g_ac, g_ca, rtol=1e-4, atol=1e-6)
