"""NN building blocks: layer primitives, backbones and necks (flax.linen, NHWC)."""
