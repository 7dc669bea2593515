"""RefineDet320 and PFPNet-R model classes (references: RefineDet.py, PFPNetR.py +
testrefinedet.py / testpfpnet.py). Both share the ARM/TCB/ODM cascade head; PFPNet
swaps the feature extractor for the MSCA parallel pyramid and requires
``input_size % 64 == 0`` (PFPNetR.py:15)."""

from __future__ import annotations

import math

from tpudet.heads import refine as refine_head
from tpudet.models.base import DetectorBase
from tpudet.runtime import pretrain


def _refine_feat_shapes(input_size: int):
    """Strides 8/16/32/64; stride-32/64 maps follow the SAME-conv chain
    (RefineDet: conv8_2 = ceil(s16/2), conv10_2 = ceil(s32/2))."""
    s8 = input_size
    for _ in range(3):
        s8 = math.ceil(s8 / 2)
    s16 = math.ceil(s8 / 2)
    s32 = math.ceil(s16 / 2)
    s64 = math.ceil(s32 / 2)
    return [(s8, s8), (s16, s16), (s32, s32), (s64, s64)]


def _pfpnet_feat_shapes(input_size: int):
    """PFPNet levels come from integer-halving conv4_3 (PFPNetR.py:320-323)."""
    s8 = input_size
    for _ in range(3):
        s8 = math.ceil(s8 / 2)
    return [(s8, s8), (s8 // 2, s8 // 2), (s8 // 4, s8 // 4), (s8 // 8, s8 // 8)]


class _RefineFamily(DetectorBase):
    extractor = "refinedet"

    def __init__(self, config, data_provider=None):
        self.input_size = int(config["input_size"])
        super().__init__(config, data_provider)

    def _build(self):
        self.net = refine_head.RefineNet(
            num_classes_total=self.num_classes, extractor=self.extractor,
            dtype=self.compute_dtype)
        shapes = (_refine_feat_shapes(self.input_size)
                  if self.extractor == "refinedet"
                  else _pfpnet_feat_shapes(self.input_size))
        self.anchors = refine_head.build_anchors(shapes)

    def _load_pretraining(self, params):
        weights = pretrain.load_vgg16(self.config.get("pretraining_weight"))
        return pretrain.inject_vgg16(params, weights, scope="feature_extractor")

    def _loss_from_outputs(self, outputs, gt, sample_weight=None):
        arms, odms = outputs
        flat = refine_head.flatten_preds(arms, odms, self.num_classes)
        return refine_head.refine_loss(
            *flat, self.anchors, gt, self.num_classes,
            neg_sel_cap=int(self.config.get("hard_neg_cap", 384)),
            sample_weight=sample_weight)

    def _decode_outputs(self, outputs, pre_topk):
        arms, odms = outputs
        flat = refine_head.flatten_preds(arms, odms, self.num_classes)
        return refine_head.refine_decode(
            *(t[0] for t in flat), self.anchors, self.num_classes,
            self.nms_score_threshold, self.nms_iou_threshold, self.nms_max_boxes,
            pre_topk=pre_topk)


class RefineDet320(_RefineFamily):
    """RefineDet (input 320 or 512, testrefinedet.py:23)."""

    extractor = "refinedet"


# The reference file/class is named RefineDet320 but accepts any input size;
# keep both names importable.
RefineDet = RefineDet320


class PFPNetR(_RefineFamily):
    extractor = "pfpnet"

    def __init__(self, config, data_provider=None):
        assert config["input_size"] % 64 == 0
        super().__init__(config, data_provider)
