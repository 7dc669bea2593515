"""Synthetic VOC-20 dataset for convergence training (the north-star mAP runs).

Real Pascal VOC is unreachable in this environment (no egress), so the VOC07-mAP
convergence protocol (BASELINE.md "north star") runs on a synthetic 20-class
detection dataset: 5,000 train + 500 held-out test scenes, every VOC class id used.
Each class is a distinct (shape, color) combination — 4 shapes x 5 colors — drawn on
a noisy background, so detection requires localizing AND classifying, and mAP@0.5 is
a meaningful end-to-end metric of the data->train->decode->eval path.

Scenes are resolution-independent (normalized geometry, shared RNG layout) and are
rendered once per model input resolution into uint8 memmaps under
``.convergence/data/<H>x<W>/``:

  train_images.npy  [N, H, W, 3] uint8 (memmap)
  train_gt.npy      [N, 60, 5] float32 — [yc, xc, h, w, class_id], -1 padded
                    (the pipeline's ground-truth contract, SURVEY.md §2.1)
  test_images.npy   [M, H, W, 3] uint8
  test_gt.npy       [M, 60, 5] float32 — CORNER rows [ymin, ymax, xmin, xmax, cid],
                    -1 padded (the raw VOC record layout evaluate_model consumes)
"""

from __future__ import annotations

import os

import numpy as np

N_TRAIN = 5000
N_TEST = 500
MAX_OBJ = 60

COLORS = np.asarray([
    (220, 35, 35),    # red
    (35, 205, 35),    # green
    (40, 70, 225),    # blue
    (230, 220, 40),   # yellow
    (205, 45, 205),   # magenta
], np.float32)
SHAPES = ("rect", "ellipse", "triangle", "ring")  # class = shape_idx * 5 + color_idx


def scene_specs(rng: np.random.Generator, n_scenes: int):
    """Resolution-independent scene descriptions.

    Each scene: (bg_base [3], noise_amp, objects [K, 6] rows
    [class_id, yc, xc, h, w, rot_unused] in normalized [0,1] coords).
    """
    scenes = []
    for _ in range(n_scenes):
        bg = rng.integers(70, 165, (3,))
        noise = float(rng.integers(6, 18))
        k = int(rng.integers(1, 6))
        objs = np.zeros((k, 6), np.float32)
        for j in range(k):
            cid = int(rng.integers(0, 20))
            h = float(rng.uniform(0.16, 0.45))
            w = float(rng.uniform(0.16, 0.45))
            yc = float(rng.uniform(h / 2 + 0.01, 1.0 - h / 2 - 0.01))
            xc = float(rng.uniform(w / 2 + 0.01, 1.0 - w / 2 - 0.01))
            objs[j] = (cid, yc, xc, h, w, 0.0)
        scenes.append((bg, noise, objs))
    return scenes


def _render_object(img, cid, y1, x1, y2, x2):
    """Draw one object into img (in place); returns nothing."""
    shape = SHAPES[cid // 5]
    color = COLORS[cid % 5]
    h, w = y2 - y1, x2 - x1
    if h < 2 or w < 2:
        return
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ny = (yy + 0.5) / h * 2.0 - 1.0   # [-1, 1] inside the box
    nx = (xx + 0.5) / w * 2.0 - 1.0
    if shape == "rect":
        mask = np.ones((h, w), bool)
    elif shape == "ellipse":
        mask = (ny ** 2 + nx ** 2) <= 1.0
    elif shape == "triangle":
        # upward wedge: apex at top-center, base at the bottom edge
        mask = np.abs(nx) <= (ny + 1.0) / 2.0
    else:  # ring
        r2 = ny ** 2 + nx ** 2
        mask = (r2 <= 1.0) & (r2 >= 0.30)
    region = img[y1:y2, x1:x2]
    region[mask] = color
    img[y1:y2, x1:x2] = region


def render_scene(spec, out_h: int, out_w: int):
    """Render one scene at a resolution; returns (image uint8, boxes [K,5] corner
    rows [ymin, ymax, xmin, xmax, cid] in pixels)."""
    bg, noise, objs = spec
    rng = np.random.default_rng(int(bg[0]) * 100003 + int(objs[0, 0]) + out_h)
    img = np.clip(
        bg[None, None, :]
        + rng.integers(-noise, noise + 1, (out_h, out_w, 3)), 0, 255
    ).astype(np.float32)
    boxes = []
    for cid, yc, xc, h, w, _ in objs:
        y1 = int(round((yc - h / 2) * out_h))
        y2 = int(round((yc + h / 2) * out_h))
        x1 = int(round((xc - w / 2) * out_w))
        x2 = int(round((xc + w / 2) * out_w))
        y1, x1 = max(y1, 0), max(x1, 0)
        y2, x2 = min(y2, out_h), min(x2, out_w)
        _render_object(img, int(cid), y1, x1, y2, x2)
        boxes.append((y1, y2 - 1, x1, x2 - 1, cid))
    return img.astype(np.uint8), np.asarray(boxes, np.float32)


def _corner_to_center(boxes):
    """[ymin, ymax, xmin, xmax, cid] -> [yc, xc, h, w, cid] (augmentor output
    convention, image_augmentor.py:217)."""
    out = np.empty_like(boxes)
    out[:, 0] = (boxes[:, 0] + boxes[:, 1]) / 2.0
    out[:, 1] = (boxes[:, 2] + boxes[:, 3]) / 2.0
    out[:, 2] = boxes[:, 1] - boxes[:, 0]
    out[:, 3] = boxes[:, 3] - boxes[:, 2]
    out[:, 4] = boxes[:, 4]
    return out


def build(root: str, out_h: int, out_w: int, n_train: int = N_TRAIN,
          n_test: int = N_TEST, seed: int = 7):
    """Render (or reuse) the dataset at a resolution; returns its directory."""
    d = os.path.join(root, f"{out_h}x{out_w}")
    done = os.path.join(d, "DONE")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    specs = scene_specs(rng, n_train + n_test)

    tr = np.lib.format.open_memmap(
        os.path.join(d, "train_images.npy"), mode="w+", dtype=np.uint8,
        shape=(n_train, out_h, out_w, 3))
    tr_gt = np.full((n_train, MAX_OBJ, 5), -1.0, np.float32)
    for i in range(n_train):
        img, boxes = render_scene(specs[i], out_h, out_w)
        tr[i] = img
        tr_gt[i, :len(boxes)] = _corner_to_center(boxes)
    tr.flush()
    np.save(os.path.join(d, "train_gt.npy"), tr_gt)

    te = np.lib.format.open_memmap(
        os.path.join(d, "test_images.npy"), mode="w+", dtype=np.uint8,
        shape=(n_test, out_h, out_w, 3))
    te_gt = np.full((n_test, MAX_OBJ, 5), -1.0, np.float32)
    for i in range(n_test):
        img, boxes = render_scene(specs[n_train + i], out_h, out_w)
        te[i] = img
        te_gt[i, :len(boxes)] = boxes
    te.flush()
    np.save(os.path.join(d, "test_gt.npy"), te_gt)
    with open(done, "w") as f:
        f.write("ok")
    return d


def load(d: str):
    """Returns (train_images memmap, train_gt, test_images memmap, test_gt)."""
    return (
        np.load(os.path.join(d, "train_images.npy"), mmap_mode="r"),
        np.load(os.path.join(d, "train_gt.npy")),
        np.load(os.path.join(d, "test_images.npy"), mmap_mode="r"),
        np.load(os.path.join(d, "test_gt.npy")),
    )


def test_records(d: str):
    """Yield (image float32, gt_corner [N,5]) pairs for evaluate_model."""
    _, _, te, te_gt = load(d)
    for i in range(te.shape[0]):
        g = te_gt[i]
        g = g[g[:, 0] >= 0]
        yield np.asarray(te[i], np.float32), g
