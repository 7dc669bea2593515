"""Backbone feature extractors (VGG-16, DarkNet-19/53, ResNet, DLA-lite, Xception-lite)."""
