"""CenterNet model class (reference: CenterNet.py + testcenternet.py).

Differences from the common skeleton: input preprocessing is ``x/255`` then ImageNet
mean/std (CenterNet.py:53-64), the optimizer is Adam (CenterNet.py:154), test-mode
config needs ``score_threshold`` + ``top_k_results_output`` (CenterNet.py:38-39), and
decode is heatmap-peak top-k with NO box NMS.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpudet.heads import centernet as center_head
from tpudet.models.base import DetectorBase
from tpudet.runtime import checkpoint as ckpt_lib
from tpudet.runtime import mesh as mesh_lib
from tpudet.runtime import optim


class CenterNet(DetectorBase):
    def __init__(self, config, data_provider=None):
        self.input_size = int(config["input_size"])
        if config["mode"] == "test":
            self.score_threshold = config["score_threshold"]
            self.top_k_results_output = config["top_k_results_output"]
        else:
            self.score_threshold = config.get("score_threshold", 0.1)
            self.top_k_results_output = config.get("top_k_results_output", 100)
        super().__init__(config, data_provider)
        self.num_classes = config["num_classes"]  # no background channel

    def _make_optimizer(self):
        return optim.Adam()

    def _preprocess(self, images):
        mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32).reshape(1, 1, 1, 3)
        std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32).reshape(1, 1, 1, 3)
        return (images / 255.0 - mean) / std

    def _build(self):
        self.raw_classes = self.config["num_classes"]
        self.net = center_head.CenterNetNet(num_classes=self.raw_classes,
                                            dtype=self.compute_dtype)

    def _loss_from_outputs(self, outputs, gt, sample_weight=None):
        keypoints, offset, size = outputs
        return center_head.centernet_loss(keypoints, offset, size, gt,
                                          self.raw_classes,
                                          sample_weight=sample_weight)

    def _decode_outputs(self, outputs, pre_topk):
        del pre_topk  # peak top-k decode has no NMS truncation (CenterNet.py:159-185)
        keypoints, offset, size = outputs
        out = center_head.centernet_decode(
            keypoints[0], offset[0], size[0], self.score_threshold,
            int(self.top_k_results_output))
        return (*out, jnp.asarray(False))

    def load_pretrained_weight(self, path: str):
        blob = ckpt_lib.load_state(path)
        params = dict(self.params)
        params["backone"] = jax.tree.map(jnp.asarray, blob["params"]["backone"])
        self.params = mesh_lib.replicate_tree(self.mesh, params)
        print("load pretrained weight", path, "successfully")
