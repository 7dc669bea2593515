"""DetectorBase: shared lifecycle for every model class.

Reproduces the reference's per-model skeleton (SURVEY.md §2.2 — config parsing,
``_define_inputs`` pixel-mean handling, saver pair, epoch loop with ``\\r`` progress,
``test_one_image`` contract) on top of a jitted, data-parallel JAX runtime:

  * one compiled train step per model: forward + loss + grads + optimizer update with
    the learning rate as a traced scalar (the reference's ``lr`` placeholder);
  * batch sharded over the ICI mesh's 'data' axis, params replicated, gradient
    all-reduce inserted by XLA (replaces the absent distribution layer, §2.5);
  * donated params/optimizer buffers to keep HBM usage flat;
  * BatchNorm statistics updated inside the step (the reference's UPDATE_OPS group);
  * weight decay = wd * sum(tf.nn.l2_loss(v)) over trainable params (SSD300.py:150-152)
    folded into the loss so the reported loss matches the reference's.

Config keys accepted per the reference drivers (testSSD300.py:21-32): mode,
data_format, num_classes, weight_decay, keep_prob (accepted-and-unused, quirk Q17),
batch_size, nms_score_threshold, nms_max_boxes, nms_iou_threshold, pretraining_weight.
Extra tpudet keys: 'compute_dtype' ('float32' default | 'bfloat16' for MXU-friendly
activations), 'seed'.
"""

from __future__ import annotations

import sys
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from tpudet.runtime import checkpoint as ckpt
from tpudet.runtime import mesh as mesh_lib
from tpudet.runtime import optim


def global_l2(params) -> jnp.ndarray:
    """sum of tf.nn.l2_loss(v) = sum(v^2)/2 over the tree (SSD300.py:150-152)."""
    leaves = jax.tree.leaves(params)
    return sum(0.5 * jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)


class DetectorBase:
    """Subclasses set ``input_size`` and implement ``_build`` (create ``self.net`` and
    any static tables), ``_loss_from_outputs``, ``_decode_outputs`` and optionally
    ``_load_pretraining`` / ``_preprocess``."""

    input_size: int = None

    def __init__(self, config: Dict[str, Any], data_provider: Optional[Dict] = None):
        assert config["mode"] in ("train", "test")
        assert config["data_format"] in ("channels_first", "channels_last")
        from tpudet.runtime import config as config_lib

        model_name = type(self).__name__
        config_lib.validate(
            config, model_name if model_name in config_lib._MODEL_REQUIRED else None)
        self.config = config
        self.data_format = config["data_format"]
        self.mode = config["mode"]
        self.num_classes = config["num_classes"] + 1  # + background
        self.weight_decay = float(config.get("weight_decay", 0.0))
        self.prob = 1.0 - config.get("keep_prob", 1.0)  # parity: never applied (Q17)
        self.batch_size = config["batch_size"] if self.mode == "train" else 1
        self.nms_score_threshold = config.get("nms_score_threshold", 0.5)
        self.nms_max_boxes = config.get("nms_max_boxes", 20)
        self.nms_iou_threshold = config.get("nms_iou_threshold", 0.5)
        self.compute_dtype = (
            jnp.bfloat16 if config.get("compute_dtype") == "bfloat16" else jnp.float32
        )
        # 'uint8' halves host->device image bandwidth; the cast to f32 happens on
        # device at the top of the step (free: XLA fuses it into the first op)
        self.input_dtype = (
            np.uint8 if config.get("input_dtype") == "uint8" else np.float32)
        self.data_provider = data_provider or {}
        if self.mode == "train" and data_provider is not None:
            self.num_train = data_provider["num_train"]
            self.num_val = data_provider.get("num_val", 0)
            gen = data_provider.get("train_generator")
            if isinstance(gen, tuple):  # reference (init_op, iterator) shape
                self.train_initializer, self.train_iterator = gen
            else:
                self.train_initializer = getattr(gen, "reset", None)
                self.train_iterator = gen
        self.global_step = 0

        self._build()
        self._init_variables()
        self._setup_mesh()
        self._compile()

    # ------------------------------------------------------------- hooks
    def _build(self):
        raise NotImplementedError

    def _loss_from_outputs(self, outputs, gt, sample_weight=None):
        """Batch loss; ``sample_weight`` masks mesh-padding rows (None = no padding)."""
        raise NotImplementedError

    def _decode_outputs(self, outputs, pre_topk: int):
        """Single-image decode: outputs -> (scores, boxes, class_id, valid,
        truncated). ``truncated`` True means more than ``pre_topk`` candidates passed
        the score filter for some class, so the caller should retry with a larger
        ``pre_topk`` for exact reference NMS semantics."""
        raise NotImplementedError

    def _make_optimizer(self):
        return optim.Momentum(0.9)

    def _load_pretraining(self, params):
        return params

    def _pixel_mean(self):
        """Per-channel RGB mean; 103.979 is the reference's value (quirk Q16)."""
        return jnp.asarray([123.68, 116.779, 103.979], jnp.float32)

    def _preprocess(self, images):
        return images - self._pixel_mean().reshape(1, 1, 1, 3)

    # --------------------------------------------------------- lifecycle
    def _data_shape_nhwc(self):
        return (self.input_size, self.input_size, 3)

    def _init_variables(self):
        key = jax.random.PRNGKey(int(self.config.get("seed", 0)))
        dummy = jnp.zeros((1, *self._data_shape_nhwc()), jnp.float32)
        variables = self.net.init(key, dummy, False)
        params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.params = self._load_pretraining(params)
        self._optimizer = self._make_optimizer()
        self.opt_state = self._optimizer.init(self.params) if self.mode == "train" else None

    def _setup_mesh(self):
        # Always use the FULL slice: when the batch does not divide the device
        # count, the batch is padded with repeated samples up to ``device_batch``
        # and the padding rows are masked out of the loss (weighted mean), instead
        # of idling devices (e.g. the reference YOLOv3 bs12 / CenterNet bs15
        # configs on a v5e-8). Multi-process (multi-host / multi-slice) runs get a
        # ('dcn', 'data') mesh; ``batch_size`` stays GLOBAL and each process feeds
        # its per-host pipeline shard (1/process_count of every batch).
        self.mesh = mesh_lib.data_mesh(dcn_size=self.config.get("dcn_size"))
        n = mesh_lib.data_parallel_size(self.mesh)
        self.process_count = jax.process_count()
        if self.mode == "train" and self.batch_size % self.process_count:
            raise ValueError(
                f"global batch_size={self.batch_size} must divide over "
                f"{self.process_count} processes")
        self.device_batch = (
            -(-self.batch_size // n) * n if self.mode == "train" else self.batch_size
        )
        self.params = mesh_lib.replicate_tree(self.mesh, self.params)
        self.batch_stats = mesh_lib.replicate_tree(self.mesh, self.batch_stats)
        if self.opt_state is not None:
            self.opt_state = mesh_lib.replicate_tree(self.mesh, self.opt_state)

    def _sample_weight(self):
        """[device_batch] mask of real rows, or None when the batch needs no pad.

        Padding happens per process (each host pads its own pipeline shard), so
        the global mask is the per-process mask tiled: rows
        [p*local_db, p*local_db + local_bs) are real for every process p."""
        if self.mode != "train" or self.device_batch == self.batch_size:
            return None
        local_db = self.device_batch // self.process_count
        local_bs = self.batch_size // self.process_count
        return jnp.asarray(
            np.tile(np.arange(local_db) < local_bs, self.process_count), jnp.float32)

    def _device_augment(self, images, gt, step):
        """Optional augmentation compiled INTO the train step (config key
        'device_augment'): the host pipeline only decodes/resizes and the
        bandwidth-heavy flip/color-jitter work rides the TPU (SURVEY.md §7.1)."""
        aug_cfg = self.config.get("device_augment")
        if not aug_cfg:
            return images, gt
        from tpudet.data import device_augment

        key = jax.random.fold_in(
            jax.random.PRNGKey(int(self.config.get("seed", 0)) ^ 0x5EED), step)
        return device_augment.apply(key, images, gt, aug_cfg)

    def _compile(self):
        net, wd, optimizer = self.net, self.weight_decay, self._optimizer
        sample_weight = self._sample_weight()
        # 'device_augment_split': compile the augmentation as its OWN dispatch
        # instead of fusing it into the train step. Workaround for the axon/Mosaic
        # worker fault triggered by the fused RefineDet-family step + width-60
        # flip-gt remap (BASELINE.md bisect matrix): the two smaller programs
        # compile and run where the fused one kills the TPU worker.
        self._augment_split = bool(self.config.get("device_augment_split"))

        def forward_loss(params, bstats, images, gt, step):
            images = images.astype(jnp.float32)
            if not self._augment_split:
                images, gt = self._device_augment(images, gt, step)
            images = self._preprocess(images)
            outputs, mut = net.apply(
                {"params": params, "batch_stats": bstats}, images, True,
                mutable=["batch_stats"],
            )
            loss = self._loss_from_outputs(outputs, gt, sample_weight)
            loss = loss + wd * global_l2(params)
            return loss, mut["batch_stats"]

        def train_step(params, bstats, opt_state, images, gt, lr, step):
            (loss, new_stats), grads = jax.value_and_grad(forward_loss, has_aux=True)(
                params, bstats, images, gt, step
            )
            new_params, new_opt = optimizer.update(grads, opt_state, params, lr)
            return new_params, new_stats, new_opt, loss

        if self.mode == "train":
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
            self._train_step_fn = train_step  # raw fn, reused by the scan path
            self._train_scan_cache = {}
            if self._augment_split:
                self._augment_fn = jax.jit(
                    lambda im, g, s: self._device_augment(
                        im.astype(jnp.float32), g, s))

        self._infer_cache = {}
        self._base_pre_topk = int(self.config.get("nms_pre_topk", 200))

    def _train_scan(self, k: int, ds=None):
        """Jitted ``k``-step trainer for device-resident feeds: per iteration an
        index row gathers the batch from the HBM-resident dataset and runs one
        train step, all inside a single ``lax.scan`` dispatch. On a tunneled chip
        each dispatch costs a host round-trip (~100 ms); folding a 50-step chunk
        into one dispatch removes that cap (measured 111 -> ~bench-rate imgs/s on
        the SSD300 convergence loop). Distributed datasets (multi-device /
        multi-host, DeviceDataset.distribute) gather each device's rows from its
        own HBM shard via shard_map — the scan epoch composes with the
        ('dcn', 'data') mesh instead of degrading to per-step dispatch."""
        distributed = bool(ds is not None and getattr(ds, "distributed", False))
        key = (k, distributed)
        fn = self._train_scan_cache.get(key)
        if fn is None:
            step_fn = self._train_step_fn
            if distributed:
                gather = ds.make_gather()
            else:
                def gather(imgs, gts, idx_row):
                    return jnp.take(imgs, idx_row, 0), jnp.take(gts, idx_row, 0)

            def scan_steps(params, bstats, opt_state, images_ds, gt_ds, idx, lr,
                           step0):
                def body(carry, idx_row):
                    params, bstats, opt_state, step = carry
                    images, gt = gather(images_ds, gt_ds, idx_row)
                    params, bstats, opt_state, loss = step_fn(
                        params, bstats, opt_state, images, gt, lr, step)
                    return (params, bstats, opt_state, step + 1), loss

                (params, bstats, opt_state, _), losses = jax.lax.scan(
                    body, (params, bstats, opt_state, step0), idx)
                return params, bstats, opt_state, losses

            fn = self._train_scan_cache[key] = jax.jit(
                scan_steps, donate_argnums=(0, 1, 2))
        return fn

    def _build_infer(self, pre_topk: int):
        net = self.net

        def infer(params, bstats, images):
            images = self._preprocess(images.astype(jnp.float32))
            outputs = net.apply({"params": params, "batch_stats": bstats}, images,
                                False)
            return self._decode_outputs(outputs, pre_topk)

        return jax.jit(infer)

    def _infer_at(self, pre_topk: int):
        fn = self._infer_cache.get(pre_topk)
        if fn is None:
            fn = self._infer_cache[pre_topk] = self._build_infer(pre_topk)
        return fn

    # ------------------------------------------------------------ public API
    def train_one_epoch(self, lr, writer=None) -> float:
        """One epoch; optional ``writer`` gets per-step loss scalars
        (YOLOv2.py:305-316 contract, available on every model here).

        Losses stay ON DEVICE behind a rolling window: the loss of the step
        dispatched ``loss_sync_every`` (config, default 16) iterations ago is
        fetched each iteration, so at most that many steps are ever in flight
        (a per-step ``float(loss)`` would block dispatch on a device round-trip
        every iteration; an unbounded queue can overwhelm a tunneled worker).
        The ``\\r`` progress line therefore shows a slightly lagged loss; the
        returned epoch mean is exact."""
        if callable(self.train_initializer):
            self.train_initializer()
        num_iters = self.num_train // self.batch_size
        sync_every = max(1, int(self.config.get("loss_sync_every", 16)))

        from tpudet.data.device_dataset import DeviceDataset

        ds = self.train_iterator
        want_scan = (isinstance(ds, DeviceDataset) and num_iters > 1
                     and not self.config.get("no_scan_epoch")
                     and not self._augment_split)  # split = separate dispatches
        if want_scan and self.process_count > 1 and not ds.distributed:
            # multi-host: shard the resident dataset over every device's HBM so
            # the scanned epoch stays one dispatch per chunk at scale too
            ds.distribute(self.mesh, self.device_batch)
        if want_scan and ds.batch == self.device_batch:
            idx = ds.scan_indices(num_iters)
            self.params, self.batch_stats, self.opt_state, losses = (
                self._train_scan(num_iters, ds)(
                    self.params, self.batch_stats, self.opt_state, ds.images,
                    ds.gt, idx, jnp.float32(lr), jnp.int32(self.global_step)))
            self.global_step += num_iters
            losses = jax.device_get(losses)
            if writer is not None:
                base = self.global_step - num_iters
                for i, lo in enumerate(losses):
                    writer.add_summary(float(lo), global_step=base + i + 1)
            sys.stdout.write(
                f"\r>> iters {num_iters - 1}/{num_iters} loss {losses[-1]}\n")
            sys.stdout.flush()
            return float(np.mean(losses))

        losses = []
        shown = float("nan")
        for i in range(num_iters):
            images, gt = next(self.train_iterator)
            images, gt = self._to_device(images, gt)
            if self._augment_split and self.config.get("device_augment"):
                images, gt = self._augment_fn(images, gt,
                                              jnp.int32(self.global_step))
            self.params, self.batch_stats, self.opt_state, loss = self._train_step(
                self.params, self.batch_stats, self.opt_state, images, gt,
                jnp.float32(lr), jnp.int32(self.global_step),
            )
            self.global_step += 1
            losses.append(loss)
            if i >= sync_every or i + 1 == num_iters:
                # rolling sync: wait for the step dispatched sync_every iters ago,
                # keeping the async queue at a bounded depth without draining it
                shown = float(losses[-1] if i + 1 == num_iters
                              else losses[i - sync_every])
            sys.stdout.write(f"\r>> iters {i}/{num_iters} loss {shown}")
            sys.stdout.flush()
            if writer is not None:
                writer.add_summary(loss, global_step=self.global_step)
        sys.stdout.write("\n")
        if not losses:
            return float("nan")
        return float(np.mean(jax.device_get(losses)))

    def _to_device(self, images, gt):
        if isinstance(images, jax.Array):
            # device-resident feed (data.device_dataset.DeviceDataset): the batch
            # was assembled ON device; nothing to transfer. Accepted shapes: the
            # local slice (single-process put) or the full device batch (a
            # distributed gather already yields the GLOBAL sharded array).
            local_db = self.device_batch // self.process_count
            if (self.mode == "train"
                    and images.shape[0] not in (local_db, self.device_batch)):
                raise ValueError(
                    f"device-resident batch is {images.shape[0]} rows; the mesh "
                    f"needs {local_db} — pad in the feeder")
            return images, gt
        images = np.ascontiguousarray(images, self.input_dtype)
        if self.data_format == "channels_first":
            images = images.transpose(0, 2, 3, 1)
        gt = np.ascontiguousarray(gt, np.float32)
        # Multi-process: this host's pipeline yields its LOCAL shard
        # (batch_size / process_count rows); pad to the local slice of the mesh.
        local_db = self.device_batch // self.process_count
        if self.mode == "train" and images.shape[0] != local_db:
            # pad the batch up to the mesh with repeated samples; the loss masks
            # them out via _sample_weight (duplicates, not zeros, so BatchNorm
            # batch statistics stay on-distribution)
            idx = np.arange(local_db) % images.shape[0]
            images, gt = images[idx], gt[idx]
        return mesh_lib.shard_batch(self.mesh, images, gt)

    def test_one_image(self, images):
        """images: [1, H, W, 3] (or CHW for channels_first). Returns
        [scores, bbox(y1x1y2x2 pixels), class_id] with padding stripped
        (SSD300.py:486-488 contract).

        NMS exactness guard: if more candidates pass the score filter than the
        compiled ``pre_topk`` (possible at the low thresholds mAP runs use), the
        decode reports truncation and is retried with a doubled ``pre_topk``
        (each size compiles once and is cached) until exact."""
        images = np.ascontiguousarray(images, np.float32)  # inference math is f32
        if self.data_format == "channels_first":
            images = images.transpose(0, 2, 3, 1)
        # Lossless uint8 transfer: decoded images are integral 0..255 pixels in
        # a float array; sending them as uint8 quarters the host->device bytes
        # (~90 ms of a 500^2 image's p50 through the tunnel is the transfer) and
        # the on-device f32 cast restores the EXACT same values. Non-integral
        # or out-of-range inputs keep the f32 path, so this is bit-exact always.
        if (images.size and images.min() >= 0.0 and images.max() <= 255.0
                and not np.any(images != np.floor(images))):
            images = images.astype(np.uint8)
        images = jnp.asarray(images)
        pre_topk = self._base_pre_topk
        while True:
            # one device_get for all outputs: separate np.asarray calls would pay
            # a device round-trip each
            scores, bbox, cid, valid, trunc = jax.device_get(
                self._infer_at(pre_topk)(self.params, self.batch_stats, images))
            if not bool(trunc):
                return [scores[valid], bbox[valid], cid[valid]]
            pre_topk *= 2  # terminates: trunc is False once pre_topk covers all

    def save_weight(self, mode: str, path: str):
        assert mode in ("latest", "best")
        state = {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": serialization.to_state_dict(self.opt_state)
            if self.opt_state is not None else {},
            "global_step": self.global_step,
        }
        fname = ckpt.save_state(path, serialization.to_state_dict(state), self.global_step)
        print("save", mode, "model in", fname, "successfully")

    def load_weight(self, path: str):
        blob = ckpt.load_state(path)
        self.params = serialization.from_state_dict(self.params, blob["params"])
        self.batch_stats = serialization.from_state_dict(self.batch_stats,
                                                         blob["batch_stats"])
        if self.opt_state is not None and blob.get("opt_state"):
            self.opt_state = serialization.from_state_dict(self.opt_state,
                                                           blob["opt_state"])
        self.global_step = int(blob.get("global_step", 0))
        self.params = mesh_lib.replicate_tree(self.mesh, self.params)
        self.batch_stats = mesh_lib.replicate_tree(self.mesh, self.batch_stats)
        if self.opt_state is not None:
            self.opt_state = mesh_lib.replicate_tree(self.mesh, self.opt_state)
        print("load weight", path, "successfully")
