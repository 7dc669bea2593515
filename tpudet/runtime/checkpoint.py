"""Checkpointing: the reference's `tf.train.Saver` save/restore contract
(SSD300.py:464-466, 490-504) on flax pytrees.

``save_state(path, state, step)`` writes a single msgpack file ``{path}-{step}.tpudet``
(mirroring Saver's ``path-{global_step}`` prefix convention). ``load_state`` accepts an
exact file path, a ``path-step`` prefix, or a bare prefix (resolves to the newest
step). The serialized dict carries params / batch_stats / opt_state / global_step so
training resumes exactly.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization

SUFFIX = ".tpudet"


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_state(path: str, state: Dict[str, Any], step: int) -> str:
    d = os.path.dirname(path)
    if d and not os.path.exists(d):
        os.makedirs(d, exist_ok=True)
        print(d, "does not exist, create it done")
    fname = f"{path}-{step}{SUFFIX}"
    blob = serialization.msgpack_serialize(_to_host(state))
    with open(fname, "wb") as f:
        f.write(blob)
    return fname


def _resolve(path: str) -> str:
    if os.path.isfile(path):
        return path
    if os.path.isfile(path + SUFFIX):
        return path + SUFFIX
    cands = glob.glob(path + "-*" + SUFFIX)
    if not cands:
        raise FileNotFoundError(f"no checkpoint matching {path!r}")

    def step_of(p):
        m = re.search(r"-(\d+)" + re.escape(SUFFIX) + r"$", p)
        return int(m.group(1)) if m else -1

    return max(cands, key=step_of)


def load_state(path: str) -> Dict[str, Any]:
    with open(_resolve(path), "rb") as f:
        return serialization.msgpack_restore(f.read())
