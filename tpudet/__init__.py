"""tpudet — a TPU-native (JAX/XLA/Pallas) object-detection framework.

From-scratch rebuild of the capabilities of the Stick-To/Object-Detection-Tensorflow
detector zoo (see SURVEY.md): SSD300/512, YOLOv2/v3, RetinaNet, RefineDet320, PFPNet-R,
Light-Head R-CNN, CenterNet and FCOS, with a shared fixed-shape ops layer (anchors, IoU
matching, box coding, NMS, heatmap decode), jitted flax backbones/necks, data-parallel
training over a `jax.sharding.Mesh`, and a TFRecord/VOC data subsystem that does not
depend on TensorFlow.
"""

__version__ = "0.1.0"
