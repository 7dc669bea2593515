"""Light-Head R-CNN model class (reference: LH_RCNN.py + testlhrcnn.py).

The reference's optimizer-level control flow (tf.case over global_step switching
between rpn and rcnn phases with different variable lists, LH_RCNN.py:187-203) is a
single jitted step here: both stage losses share one forward, ``lax.cond`` on the
phase picks the loss that is differentiated, and the parameter/momentum update is
``where``-masked per top-level scope ('feature_extractor'+'rpn' vs 'rcnn') so the
off-phase variables (and their momentum slots) stay untouched — exactly TF's
apply_gradients-with-var-list semantics. BatchNorm statistics update every step in
both phases (the reference groups update_ops unconditionally).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tpudet.heads import lhrcnn as lh
from tpudet.models.base import DetectorBase, global_l2
from tpudet.runtime import checkpoint as ckpt_lib
from tpudet.runtime import mesh as mesh_lib


class _RPNHead(nn.Module):
    num_anchors: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, c4, train: bool):
        from tpudet.nn.layers import ConvBN

        r = ConvBN(256, 3, activation=nn.relu, dtype=self.dtype,
                   name="rpn_conv")(c4, train)
        conf = ConvBN(self.num_anchors * 2, 3, dtype=self.dtype,
                      name="rpn_conf")(r, train)
        loc = ConvBN(self.num_anchors * 4, 3, dtype=self.dtype,
                     name="rpn_pbbox")(r, train)
        return conf, loc


class _RCNNPart(nn.Module):
    num_classes_total: int
    dtype: jnp.dtype

    def setup(self):
        self.state5_conv1_1 = lh.SeparableConvBN(256, (1, 15), dtype=self.dtype)
        self.state5_conv1_2 = lh.SeparableConvBN(490, (15, 1), dtype=self.dtype)
        self.state5_conv2_1 = lh.SeparableConvBN(256, (1, 15), dtype=self.dtype)
        self.state5_conv2_2 = lh.SeparableConvBN(490, (15, 1), dtype=self.dtype)
        self.head = lh.RoIHead(self.num_classes_total, dtype=self.dtype)

    def thin_feature(self, c4, train: bool):
        b1 = self.state5_conv1_2(self.state5_conv1_1(c4, train), train)
        b2 = self.state5_conv2_2(self.state5_conv2_1(c4, train), train)
        return b1 + b2

    def roi_head(self, feats):
        return self.head(feats)


class LHRCNNNet(nn.Module):
    num_classes_total: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.feature_extractor = lh.XceptionLite(dtype=self.dtype)
        self.rpn = _RPNHead(num_anchors=15, dtype=self.dtype)
        self.rcnn = _RCNNPart(self.num_classes_total, dtype=self.dtype)

    def __call__(self, x, train: bool):
        c4 = self.feature_extractor(x, train)
        rpn_conf, rpn_loc = self.rpn(c4, train)
        rcnn_feat = self.rcnn.thin_feature(c4, train)
        return rpn_conf, rpn_loc, rcnn_feat

    def roi_head(self, feats):
        return self.rcnn.roi_head(feats)


class LHRCNN(DetectorBase):
    def __init__(self, config, data_provider=None):
        assert len(config["data_shape"]) == 3
        self.data_shape_hw = tuple(config["data_shape"][:2]) \
            if config["data_format"] == "channels_last" else tuple(config["data_shape"][1:])
        self.rpn_first_step = int(config["rpn_first_step"])
        self.rcnn_first_step = int(config["rcnn_first_step"])
        self.rpn_second_step = int(config["rpn_second_step"])
        self.post_nms_proposal = int(config.get("post_nms_proposal", 500))
        super().__init__(config, data_provider)

    def _data_shape_nhwc(self):
        return (*self.data_shape_hw, 3)

    def _preprocess(self, images):
        return images / 127.5 - 1.0  # LH_RCNN.py:65

    def _build(self):
        self.net = LHRCNNNet(num_classes_total=self.num_classes,
                             dtype=self.compute_dtype)
        h, w = self.data_shape_hw
        fh, fw = math.ceil(h / 32), math.ceil(w / 32)
        self.anchors, self._anchor_keep = lh.build_anchors(fh, fw, 32.0, h, w)
        self._keep_idx = jnp.asarray(np.where(self._anchor_keep)[0], jnp.int32)

    def _init_variables(self):
        # init must trace BOTH the trunk and the RoI head so the dense params exist
        key = jax.random.PRNGKey(int(self.config.get("seed", 0)))
        dummy = jnp.zeros((1, *self._data_shape_nhwc()), jnp.float32)
        feats = jnp.zeros((1, 7, 7, 490), jnp.float32)

        def init_all(mdl):
            out = mdl(dummy, False)
            head = mdl.roi_head(feats)
            return out, head

        variables = self.net.init(key, method=init_all)
        self.batch_stats = variables.get("batch_stats", {})
        self.params = self._load_pretraining(variables["params"])
        self._optimizer = self._make_optimizer()
        self.opt_state = self._optimizer.init(self.params) if self.mode == "train" else None

    def _split_rpn(self, rpn_conf, rpn_loc):
        b = rpn_conf.shape[0]
        conf = rpn_conf.reshape(b, -1, 2).astype(jnp.float32)[:, self._keep_idx]
        loc = rpn_loc.reshape(b, -1, 4).astype(jnp.float32)[:, self._keep_idx]
        return loc[..., :2], loc[..., 2:], conf

    def _compile(self):
        net, wd, optimizer = self.net, self.weight_decay, self._optimizer
        h, w = self.data_shape_hw
        c_total = self.num_classes
        anc = self.anchors
        s1, s2, s3 = self.rpn_first_step, self.rcnn_first_step, self.rpn_second_step

        sample_weight = self._sample_weight()

        def forward_losses(params, bstats, images, gt, is_rpn, step):
            images = images.astype(jnp.float32)
            images, gt = self._device_augment(images, gt, step)
            images = self._preprocess(images)
            (rpn_conf, rpn_loc, rcnn_feat), mut = net.apply(
                {"params": params, "batch_stats": bstats}, images, True,
                mutable=["batch_stats"])
            pyx, phw, pconf = self._split_rpn(rpn_conf, rpn_loc)
            sample = lh.rpn_loss_and_sample(pyx, phw, pconf, anc, gt)
            from tpudet.ops import losses as loss_ops

            rpn_loss = loss_ops.weighted_mean(sample.rpn_loss, sample_weight)

            def roi_fn(feats):
                return net.apply({"params": params, "batch_stats": bstats}, feats,
                                 method=LHRCNNNet.roi_head)

            # rcnn_feat keeps its compute dtype: under bf16 the RoI einsum-crop
            # runs on bf16 (halving the [N,S,H,C] contraction intermediate —
            # the f32 form OOM'd the bs32 reference config); f32 models still
            # crop in f32 (loss-parity harness unchanged)
            rcnn_loss = lh.rcnn_losses(roi_fn, rcnn_feat, sample,
                                       float(h), float(w), c_total,
                                       sample_weight=sample_weight)
            fe_rpn_l2 = global_l2({"fe": params["feature_extractor"],
                                   "rpn": params["rpn"]})
            rcnn_l2 = global_l2(params["rcnn"])
            rpn_total = rpn_loss + wd * fe_rpn_l2
            rcnn_total = rcnn_loss + wd * rcnn_l2
            loss = jax.lax.cond(is_rpn, lambda: rpn_total, lambda: rcnn_total)
            return loss, mut["batch_stats"]

        def train_step(params, bstats, opt_state, images, gt, lr, step):
            is_rpn = jnp.logical_or(
                step < s1, jnp.logical_and(step >= s2, step < s3))
            (loss, new_stats), grads = jax.value_and_grad(
                forward_losses, has_aux=True)(params, bstats, images, gt, is_rpn,
                                              step)
            cand_params, cand_opt = optimizer.update(grads, opt_state, params, lr)

            def merge(scope_filter, new_tree, old_tree, scope):
                upd = is_rpn if scope in ("feature_extractor", "rpn") else \
                    jnp.logical_not(is_rpn)
                return jax.tree.map(lambda n, o: jnp.where(upd, n, o),
                                    new_tree, old_tree)

            new_params = {s: merge(None, cand_params[s], params[s], s)
                          for s in params}
            new_vel = {s: merge(None, cand_opt.velocity[s], opt_state.velocity[s], s)
                       for s in opt_state.velocity}
            from tpudet.runtime.optim import MomentumState

            return new_params, new_stats, MomentumState(new_vel), loss

        if self.mode == "train":
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
            self._train_step_fn = train_step  # raw fn, reused by the scan path
            self._train_scan_cache = {}
        self._augment_split = False  # augment always fused here (base contract)

        self._infer_cache = {}
        self._base_pre_topk = int(self.config.get("nms_pre_topk", 100))

    def _build_infer(self, pre_topk: int):
        net = self.net
        h, w = self.data_shape_hw
        c_total, anc = self.num_classes, self.anchors

        def infer(params, bstats, images):
            images = self._preprocess(images.astype(jnp.float32))
            rpn_conf, rpn_loc, rcnn_feat = net.apply(
                {"params": params, "batch_stats": bstats}, images, False)
            pyx, phw, pconf = self._split_rpn(rpn_conf, rpn_loc)

            def roi_fn(feats):
                return net.apply({"params": params, "batch_stats": bstats}, feats,
                                 method=LHRCNNNet.roi_head)

            return lh.lhrcnn_decode(
                roi_fn, rcnn_feat[0].astype(jnp.float32), pyx[0], phw[0], pconf[0],
                anc, float(h), float(w), c_total, self.post_nms_proposal,
                self.nms_score_threshold, self.nms_iou_threshold, self.nms_max_boxes,
                pre_topk=pre_topk)

        return jax.jit(infer)

    def train_one_epoch(self, lr):
        from tpudet.data.device_dataset import DeviceDataset

        if (isinstance(self.train_iterator, DeviceDataset)
                and self.num_train // self.batch_size > 1
                and not self.config.get("no_scan_epoch")):
            # device-resident feed: the base one-dispatch lax.scan epoch (the
            # per-step path below pays a ~100 ms tunnel round-trip per step —
            # round-4's LHRCNN-long ran at ~half device rate because of it).
            # The per-phase rpn_loss/rcnn_loss progress naming is a per-step
            # nicety; the phase schedule itself is inside the jitted step.
            return super().train_one_epoch(lr)
        if callable(self.train_initializer):
            self.train_initializer()
        num_iters = self.num_train // self.batch_size
        sync_every = max(1, int(self.config.get("loss_sync_every", 16)))
        losses = []
        shown = float("nan")
        for i in range(num_iters):
            images, gt = next(self.train_iterator)
            images, gt = self._to_device(images, gt)
            self.params, self.batch_stats, self.opt_state, loss = self._train_step(
                self.params, self.batch_stats, self.opt_state, images, gt,
                jnp.float32(lr), jnp.int32(self.global_step))
            self.global_step += 1
            losses.append(loss)
            if (i + 1) % sync_every == 0 or i + 1 == num_iters:
                shown = float(loss)
            if self.global_step < self.rpn_first_step:
                loss_name = "rpn_loss"
            elif self.global_step < self.rcnn_first_step:
                loss_name = "rcnn_loss"
            elif self.global_step < self.rpn_second_step:
                loss_name = "rpn_loss"
            else:
                loss_name = "rcnn_loss"
            print("iters ", f"{i + 1}/{num_iters}", loss_name, shown,
                  "global_step", self.global_step)
        if not losses:
            return float("nan")
        return float(np.mean(jax.device_get(losses)))

    def load_rpn_weight(self, path: str):
        """Restore the RPN stage (feature_extractor + rpn scopes) from a checkpoint.

        The reference declares this API but ships it broken — LH_RCNN.py:506-508
        references a ``self.rpn_saver`` that is never created. Per the
        parity-with-intent policy (SURVEY.md §0.1) this is the working form: the
        intended saver scope is the variables the rpn training phase owns.
        """
        blob = ckpt_lib.load_state(path)
        params = dict(self.params)
        for scope in ("feature_extractor", "rpn"):
            params[scope] = jax.tree.map(jnp.asarray, blob["params"][scope])
        self.params = mesh_lib.replicate_tree(self.mesh, params)
        bstats = dict(self.batch_stats)
        for scope in ("feature_extractor", "rpn"):
            if scope in blob.get("batch_stats", {}):
                bstats[scope] = jax.tree.map(jnp.asarray,
                                             blob["batch_stats"][scope])
        self.batch_stats = mesh_lib.replicate_tree(self.mesh, bstats)
        print(">> load rpn weight", path, "successfully")

    def load_pretraining_weight(self, path: str):
        """Restore the feature_extractor scope (LH_RCNN.py:510-512)."""
        blob = ckpt_lib.load_state(path)
        params = dict(self.params)
        params["feature_extractor"] = jax.tree.map(
            jnp.asarray, blob["params"]["feature_extractor"])
        self.params = mesh_lib.replicate_tree(self.mesh, params)
        print(">> load pretraining weight", path, "successfully")
