"""Per-family detection heads: anchors + target assignment + loss + decode."""
