"""YOLOv2 / YOLOv3 model classes (references: YOLOv2.py, YOLOv3.py + drivers).

Config keys beyond the common set: ``data_shape``, ``coord_scale``, ``noobj_scale``,
``obj_scale``, ``class_scale``, ``priors`` (YOLOv2: [[h,w]...] in grid units;
YOLOv3: 3 lists in pixels, divided by stride [8,16,32] — quirk Q4), ``num_priors``
(YOLOv3), ``rescore_confidence`` (accepted, unused — quirk Q13).

Opt-in extensions (default off = reference-faithful):
  * ``consistent_geometry`` — decode inverts the training encoding
    (multiplicative hw, true strides, no half-cell bias) instead of quirks Q3/Q4;
  * ``raw_prediction_conv`` — plain conv+bias prediction layer instead of the
    reference's BN(+LeakyReLU for v3) prediction conv (YOLOv3.py:416,494-507),
    which compresses negative logits and blocks objectness convergence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpudet.heads import yolo as yolo_head
from tpudet.models.base import DetectorBase
from tpudet.runtime import checkpoint as ckpt_lib
from tpudet.runtime import mesh as mesh_lib


class _YOLOBase(DetectorBase):
    def __init__(self, config, data_provider=None):
        assert len(config["data_shape"]) == 3
        self.data_shape_hw = tuple(config["data_shape"][:2]) \
            if config["data_format"] == "channels_last" else tuple(config["data_shape"][1:])
        # opt-in extension (documented, default off = reference-faithful): decode
        # inverts the training encoding (multiplicative hw, true strides) and the
        # noobj mask uses real anchor boxes instead of the swapped-corner pseudo
        # boxes (quirks Q3/Q4 + YOLOv2.py:148-151)
        self.consistent = bool(config.get("consistent_geometry", False))
        self.scales = (float(config.get("coord_scale", 1.0)),
                       float(config.get("class_scale", 1.0)),
                       float(config.get("obj_scale", 1.0)),
                       float(config.get("noobj_scale", 1.0)))
        super().__init__(config, data_provider)
        # YOLO heads have no background class (YOLOv2.py:19): num_classes stays raw
        self.num_classes = config["num_classes"]

    def _data_shape_nhwc(self):
        return (*self.data_shape_hw, 3)

    def load_pretraining_weight(self, path: str):
        """Restore the 'backone' scope from one of our checkpoints
        (YOLOv2.py:341-343)."""
        blob = ckpt_lib.load_state(path)
        params = dict(self.params)
        params["backone"] = jax.tree.map(jnp.asarray, blob["params"]["backone"])
        self.params = mesh_lib.replicate_tree(self.mesh, params)
        bstats = dict(self.batch_stats)
        if "backone" in blob.get("batch_stats", {}):
            bstats["backone"] = jax.tree.map(jnp.asarray,
                                             blob["batch_stats"]["backone"])
        self.batch_stats = mesh_lib.replicate_tree(self.mesh, bstats)
        print(">> load pretraining weight", path, "successfully")


class YOLOv2(_YOLOBase):
    """Single-scale grid regression on DarkNet-19 (YOLOv2.py)."""

    def _build(self):
        cfg = self.config
        self.raw_classes = cfg["num_classes"]
        self.priors_hw = [list(map(float, p)) for p in cfg["priors"]]
        self.downsampling_rate = 32.0
        self.net = yolo_head.YOLOv2Net(
            final_units=(self.raw_classes + 5) * len(self.priors_hw),
            dtype=self.compute_dtype,
            raw_pred=bool(cfg.get("raw_prediction_conv", False)))

    def _loss_from_outputs(self, outputs, gt, sample_weight=None):
        return yolo_head.yolov2_loss(outputs, self.priors_hw, gt, self.raw_classes,
                                     self.downsampling_rate, self.scales,
                                     sample_weight=sample_weight,
                                     consistent=self.consistent)

    def _decode_outputs(self, outputs, pre_topk):
        return yolo_head.yolov2_decode(
            outputs[0], self.priors_hw, self.raw_classes, self.downsampling_rate,
            self.nms_score_threshold, self.nms_iou_threshold, self.nms_max_boxes,
            pre_topk=pre_topk, consistent=self.consistent)


class YOLOv3(_YOLOBase):
    """Three-scale DarkNet-53 detector (YOLOv3.py) with quirks Q3-Q5 preserved."""

    def _build(self):
        cfg = self.config
        self.raw_classes = cfg["num_classes"]
        if self.consistent:
            # consistent_geometry: large priors on the stride-32 head, each divided
            # by its own head's stride, so decode inverts training on every head
            head_strides = (32.0, 16.0, 8.0)
            priors = list(reversed(cfg["priors"]))
        else:
            head_strides = (8.0, 16.0, 32.0)  # divisor list (quirk Q4)
            priors = cfg["priors"]
        self.priors_per_head = [
            [[p[0] / s, p[1] / s] for p in head_priors]
            for head_priors, s in zip(priors, head_strides)
        ]
        num_priors = int(cfg.get("num_priors", len(cfg["priors"][0])))
        self.net = yolo_head.YOLOv3Net(
            final_units=(self.raw_classes + 5) * num_priors,
            dtype=self.compute_dtype,
            raw_pred=bool(cfg.get("raw_prediction_conv", False)))

    def _loss_from_outputs(self, outputs, gt, sample_weight=None):
        return yolo_head.yolov3_loss(outputs, self.priors_per_head, gt,
                                     self.raw_classes, self.scales,
                                     sample_weight=sample_weight,
                                     consistent=self.consistent)

    def _decode_outputs(self, outputs, pre_topk):
        return yolo_head.yolov3_decode(
            [o[0] for o in outputs], self.priors_per_head, self.raw_classes,
            self.nms_score_threshold, self.nms_iou_threshold, self.nms_max_boxes,
            pre_topk=pre_topk, consistent=self.consistent)
