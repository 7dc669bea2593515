"""Shared fixed-shape detection ops (the rebuild's native/XLA kernel layer).

These replace the TF C++ kernels the reference leaned on (tf.image.non_max_suppression,
crop_and_resize, boolean_mask/SparseTensor assignment machinery) with batched, jittable,
fixed-shape equivalents designed for XLA on TPU.
"""

from tpudet.ops import anchors, boxes, losses, matching, nms  # noqa: F401
