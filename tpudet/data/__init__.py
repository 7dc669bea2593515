"""Data subsystem: TFRecord IO without TensorFlow, VOC/ImageNet dataset authoring,
the image augmentor, and the host-side input pipeline feeding the device mesh."""
