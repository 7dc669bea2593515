"""FCOS model class (reference: FCOS.py + testfcos.py).

Backbone is the fixed bottleneck-[3,4,6,3] GroupNorm ResNet with widths [16*2^i]
(FCOS.py:29-31; ``is_bottleneck`` is a truthy tuple in the reference — quirk Q18 —
so the bottleneck path is always taken). ``load_pretrained_weight`` (note the
reference's spelling) restores the 'backone' scope.

Opt-in ``consistent_objective`` config key (non-reference extension, mirrors the
YOLO family's ``consistent_geometry``): replaces the reference objective's three
convergence-hostile terms (FCOS.py:315-347 — every-cell centerness CE, symmetric
focal alpha on negatives, ÷sum(heat_gt) per level) with the FCOS paper's actual
loss (positives-only centerness CE, 0.25/0.75 asymmetric focal, ÷N_pos per image)
and emits all ``num_classes`` at decode instead of dropping the last one (Q9).
The default path stays loss-scalar and box-for-box parity-exact vs the running
reference (scripts/parity_fcos.py, scripts/parity_loss.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpudet.heads import fcos as fcos_head
from tpudet.models.base import DetectorBase
from tpudet.runtime import checkpoint as ckpt_lib
from tpudet.runtime import mesh as mesh_lib


class FCOS(DetectorBase):
    def __init__(self, config, data_provider=None):
        assert len(config["data_shape"]) == 3
        self.data_shape_hw = tuple(config["data_shape"][:2]) \
            if config["data_format"] == "channels_last" else tuple(config["data_shape"][1:])
        self.consistent = bool(config.get("consistent_objective", False))
        super().__init__(config, data_provider)
        self.num_classes = config["num_classes"]  # no background channel (FCOS.py:19)

    def _data_shape_nhwc(self):
        return (*self.data_shape_hw, 3)

    def _build(self):
        self.raw_classes = self.config["num_classes"]
        self.net = fcos_head.FCOSNet(num_classes=self.raw_classes,
                                     dtype=self.compute_dtype)

    def _loss_from_outputs(self, outputs, gt, sample_weight=None):
        return fcos_head.fcos_loss(outputs, gt, self.raw_classes,
                                   sample_weight=sample_weight,
                                   consistent=self.consistent)

    def _decode_outputs(self, outputs, pre_topk):
        single = [tuple(t[0] for t in lvl) for lvl in outputs]
        return fcos_head.fcos_decode(
            single, self.raw_classes, self.nms_score_threshold,
            self.nms_iou_threshold, self.nms_max_boxes, pre_topk=pre_topk,
            emit_all_classes=self.consistent)

    def load_pretrained_weight(self, path: str):
        blob = ckpt_lib.load_state(path)
        params = dict(self.params)
        params["backone"] = jax.tree.map(jnp.asarray, blob["params"]["backone"])
        self.params = mesh_lib.replicate_tree(self.mesh, params)
        print("load pretrained weight", path, "successfully")
