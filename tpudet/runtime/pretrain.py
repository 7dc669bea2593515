"""Pretrained-weight ingestion.

The reference injects TF-slim ``vgg_16.ckpt`` tensors as variable initializers at
graph-build time (SSD300.py:31, 192-303) and restores backbone-scoped Savers for the
other models (CenterNet.py:278-281). Here ingestion is a pure param-tree update:

  * ``load_vgg16(path)`` reads the TF-slim checkpoint — either a ``.npz`` export with
    the original variable names, or a native TF checkpoint (read lazily via
    tensorflow's checkpoint reader when that package is importable; TF is never a
    runtime dependency of the compute path);
  * ``inject_vgg16(params, weights, scope)`` maps
    ``vgg_16/convN/convN_M/{weights,biases}`` onto the flax tree
    ``{scope}/vgg/convN_M/conv/{kernel,bias}`` (layouts already agree: HWIO).

Missing checkpoint files log a warning and leave random init in place (the reference
would crash; documented usability fix — training from scratch remains possible).
"""

from __future__ import annotations

import os
import warnings
from typing import Dict, Optional

import numpy as np


def load_vgg16(path: str) -> Optional[Dict[str, np.ndarray]]:
    """Read vgg_16 variables into {tf_name: array}; None if file missing."""
    if path is None:
        return None
    if not os.path.exists(path) and not os.path.exists(path + ".index"):
        warnings.warn(f"pretraining weight {path!r} not found; using random init")
        return None
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    # native TF checkpoint: use tensorflow's reader if available
    try:
        from tensorflow.python.training import py_checkpoint_reader  # type: ignore

        reader = py_checkpoint_reader.NewCheckpointReader(path)
        return {
            name: reader.get_tensor(name)
            for name in reader.get_variable_to_shape_map()
            if name.startswith("vgg_16/conv")
        }
    except Exception as e:  # pragma: no cover - depends on env
        warnings.warn(f"could not read TF checkpoint {path!r}: {e}; using random init")
        return None


_VGG_BLOCKS = {"conv1": 2, "conv2": 2, "conv3": 3, "conv4": 3, "conv5": 3}


def inject_vgg16(params, weights: Dict[str, np.ndarray], scope: str = "feature_extractor",
                 trunk: str = "vgg"):
    """Return a params tree with the VGG trunk convs replaced by checkpoint values."""
    if weights is None:
        return params
    import jax.numpy as jnp

    params = dict(params)
    outer = dict(params[scope])
    vgg = {k: dict(v) for k, v in outer[trunk].items()}
    for block, reps in _VGG_BLOCKS.items():
        for i in range(1, reps + 1):
            layer = f"{block}_{i}"
            w = weights.get(f"vgg_16/{block}/{layer}/weights")
            b = weights.get(f"vgg_16/{block}/{layer}/biases")
            if w is None or b is None:
                warnings.warn(f"vgg_16 tensor for {layer} missing; left at random init")
                continue
            conv = dict(vgg[layer]["conv"])
            assert conv["kernel"].shape == w.shape, (layer, conv["kernel"].shape, w.shape)
            conv["kernel"] = jnp.asarray(w)
            conv["bias"] = jnp.asarray(b)
            vgg[layer] = {"conv": conv}
    outer[trunk] = vgg
    params[scope] = outer
    return params
