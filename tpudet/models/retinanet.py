"""RetinaNet model class (reference: RetinaNet.py + testretinanet.py), including the
ImageNet backbone-pretraining mode (RetinaNet.py:61-69, 120-135).

Extra config keys beyond the common set: ``data_shape`` [h,w,3], ``is_bottleneck``,
``residual_block_list``, ``init_conv_filters``, ``is_pretraining``, ``alpha``,
``gamma``. Stage widths are ``[7 * 2^i]`` (derived from the 7x7 init kernel — quirk
Q7, RetinaNet.py:27). In pretraining mode the "logits" are the global average pool of
the final backbone features (channel count = final stage width — reference behavior,
RetinaNet.py:124-126).
"""

from __future__ import annotations

import math
import sys

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tpudet.heads import retina as retina_head
from tpudet.heads import ssd as ssd_head
from tpudet.models.base import DetectorBase, global_l2
from tpudet.nn.backbones.resnet import PreActResNet
from tpudet.nn.necks.fpn import RetinaFPN
from tpudet.runtime import checkpoint as ckpt_lib
from tpudet.runtime import mesh as mesh_lib


class _RetinaExtractor(nn.Module):
    """Backbone + FPN under the 'feature_extractor' param scope (so pretraining and
    detection checkpoints share the backbone subtree name)."""

    block_list: tuple
    init_conv_filters: int
    is_bottleneck: bool
    with_fpn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        c3, c4, c5 = PreActResNet(
            block_list=self.block_list, init_conv_filters=self.init_conv_filters,
            width_base=7, is_bottleneck=self.is_bottleneck, dtype=self.dtype,
            name="backbone")(x, train)
        if not self.with_fpn:
            return c5
        return RetinaFPN(dtype=self.dtype, name="fpn")(c3, c4, c5, train)


class RetinaDetectionNet(nn.Module):
    num_classes_total: int
    block_list: tuple
    init_conv_filters: int
    is_bottleneck: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        levels = _RetinaExtractor(
            self.block_list, self.init_conv_filters, self.is_bottleneck,
            dtype=self.dtype, name="feature_extractor")(x, train)
        return retina_head.RetinaSubnets(
            self.num_classes_total, dtype=self.dtype, name="regressor")(levels, train)


class RetinaPretrainNet(nn.Module):
    block_list: tuple
    init_conv_filters: int
    is_bottleneck: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        c5 = _RetinaExtractor(
            self.block_list, self.init_conv_filters, self.is_bottleneck,
            with_fpn=False, dtype=self.dtype, name="feature_extractor")(x, train)
        return jnp.mean(c5.astype(jnp.float32), axis=(1, 2))  # global pool "logits"


def _stage_shapes(h: int, w: int, num_stages: int):
    hh, ww = math.ceil(h / 2), math.ceil(w / 2)
    hh, ww = math.ceil(hh / 2), math.ceil(ww / 2)
    out = [(hh, ww)]
    for _ in range(num_stages - 1):
        hh, ww = math.ceil(hh / 2), math.ceil(ww / 2)
        out.append((hh, ww))
    return out


class RetinaNet(DetectorBase):
    def __init__(self, config, data_provider=None):
        assert len(config["data_shape"]) == 3
        self.data_shape_hw = tuple(config["data_shape"][:2]) \
            if config["data_format"] == "channels_last" else tuple(config["data_shape"][1:])
        self.is_pretraining = bool(config.get("is_pretraining", False))
        self.alpha = config.get("alpha", 0.25)
        self.gamma = config.get("gamma", 2.0)
        super().__init__(config, data_provider)

    # -------------------------------------------------- build
    def _data_shape_nhwc(self):
        return (*self.data_shape_hw, 3)

    def _build(self):
        cfg = self.config
        kwargs = dict(
            block_list=tuple(cfg["residual_block_list"]),
            init_conv_filters=cfg.get("init_conv_filters", 16),
            is_bottleneck=bool(cfg["is_bottleneck"]),
            dtype=self.compute_dtype,
        )
        if self.is_pretraining:
            self.net = RetinaPretrainNet(**kwargs)
            return
        self.net = RetinaDetectionNet(num_classes_total=self.num_classes, **kwargs)
        h, w = self.data_shape_hw
        stages = _stage_shapes(h, w, len(cfg["residual_block_list"]))
        p3, p4, p5 = stages[-3], stages[-2], stages[-1]
        p6 = (math.ceil(p5[0] / 2), math.ceil(p5[1] / 2))
        p7 = (math.ceil(p6[0] / 2), math.ceil(p6[1] / 2))
        self.anchors = retina_head.build_anchors(h, [p3, p4, p5, p6, p7])

    # -------------------------------------------------- detection hooks
    def _loss_from_outputs(self, outputs, gt, sample_weight=None):
        if self.is_pretraining:
            labels = gt.astype(jnp.int32)
            from tpudet.ops import losses as loss_ops

            return jnp.mean(loss_ops.softmax_cross_entropy(outputs, labels))
        pconf, pyx, phw = retina_head.flatten_preds(outputs, self.num_classes)
        return retina_head.retina_loss(pconf, pyx, phw, self.anchors, gt,
                                       self.num_classes, self.alpha, self.gamma,
                                       sample_weight=sample_weight)

    def _decode_outputs(self, outputs, pre_topk):
        pconf, pyx, phw = retina_head.flatten_preds(outputs, self.num_classes)
        return ssd_head.ssd_decode(
            pconf[0], pyx[0], phw[0], self.anchors,
            self.nms_score_threshold, self.nms_iou_threshold, self.nms_max_boxes,
            pre_topk=pre_topk,
        )

    # -------------------------------------------------- pretraining mode
    def _compile(self):
        if not self.is_pretraining:
            super()._compile()
            return
        net, wd, optimizer = self.net, self.weight_decay, self._optimizer

        def forward_loss(params, bstats, images, labels):
            images = self._preprocess(images)
            logits, mut = net.apply(
                {"params": params, "batch_stats": bstats}, images, True,
                mutable=["batch_stats"])
            loss = self._loss_from_outputs(logits, labels)
            acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
            return loss + wd * global_l2(params), (mut["batch_stats"], acc)

        def train_step(params, bstats, opt_state, images, labels, lr):
            (loss, (new_stats, acc)), grads = jax.value_and_grad(
                forward_loss, has_aux=True)(params, bstats, images, labels)
            new_params, new_opt = optimizer.update(grads, opt_state, params, lr)
            return new_params, new_stats, new_opt, loss, acc

        if self.mode == "train":
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))

        def infer(params, bstats, images):
            images = self._preprocess(images)
            logits = net.apply({"params": params, "batch_stats": bstats}, images, False)
            return jnp.argmax(logits, -1)

        self._infer = jax.jit(infer)

    def train_one_epoch(self, lr):
        if not self.is_pretraining:
            return super().train_one_epoch(lr)
        if callable(self.train_initializer):
            self.train_initializer()
        num_iters = self.num_train // self.batch_size
        losses, accs = [], []
        for i in range(num_iters):
            images, labels = next(self.train_iterator)
            images, labels = self._to_device(images, np.asarray(labels, np.int32))
            (self.params, self.batch_stats, self.opt_state, loss, acc) = \
                self._train_step(self.params, self.batch_stats, self.opt_state,
                                 images, labels, jnp.float32(lr))
            self.global_step += 1
            losses.append(float(loss))
            accs.append(float(acc))
            sys.stdout.write(f"\r>> iters {i + 1}/{num_iters} loss {losses[-1]}")
            sys.stdout.flush()
        sys.stdout.write("\n")
        return float(np.mean(losses)), float(np.mean(accs))

    def test_one_image(self, images):
        if not self.is_pretraining:
            return super().test_one_image(images)
        images = np.ascontiguousarray(images, np.float32)
        if self.data_format == "channels_first":
            images = images.transpose(0, 2, 3, 1)
        return np.asarray(self._infer(self.params, self.batch_stats,
                                      jnp.asarray(images)))

    def save_weight(self, mode, path):
        if not self.is_pretraining:
            return super().save_weight(mode, path)
        assert mode in ("latest", "best")
        from flax import serialization

        state = {
            "params": {"feature_extractor": self.params["feature_extractor"]},
            "batch_stats": {"feature_extractor": self.batch_stats["feature_extractor"]},
            "global_step": self.global_step,
        }
        fname = ckpt_lib.save_state(path, serialization.to_state_dict(state),
                                    self.global_step)
        print(">> save", mode, "model in", fname, "successfully")

    def load_pretraining_weight(self, path):
        """Merge a pretraining checkpoint's backbone into this model
        (RetinaNet.py:537-539: restores the feature_extractor scope)."""
        blob = ckpt_lib.load_state(path)
        params = dict(self.params)
        fe = dict(params["feature_extractor"])
        fe["backbone"] = jax.tree.map(
            jnp.asarray, blob["params"]["feature_extractor"]["backbone"])
        params["feature_extractor"] = fe
        self.params = mesh_lib.replicate_tree(self.mesh, params)
        bstats = dict(self.batch_stats)
        bfe = dict(bstats.get("feature_extractor", {}))
        bfe["backbone"] = jax.tree.map(
            jnp.asarray, blob["batch_stats"]["feature_extractor"]["backbone"])
        bstats["feature_extractor"] = bfe
        self.batch_stats = mesh_lib.replicate_tree(self.mesh, bstats)
        print(">> load pretraining weight", path, "successfully")
