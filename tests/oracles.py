"""NumPy oracles transcribing the reference formulas (SURVEY.md §4 "Parity").

These are deliberately written in plain NumPy, following the TF1 reference's math
step-by-step (citations inline), so unit tests can check the JAX/XLA implementations
against an independent rendering of the same semantics.
"""

import numpy as np


def iou_matrix(g_y1x1, g_y2x2, a_y1x1, a_y2x2):
    """SSD300.py:356-376."""
    G, A = g_y1x1.shape[0], a_y1x1.shape[0]
    out = np.zeros((G, A), np.float64)
    for i in range(G):
        for j in range(A):
            y1 = max(g_y1x1[i, 0], a_y1x1[j, 0])
            x1 = max(g_y1x1[i, 1], a_y1x1[j, 1])
            y2 = min(g_y2x2[i, 0], a_y2x2[j, 0])
            x2 = min(g_y2x2[i, 1], a_y2x2[j, 1])
            inter = max(y2 - y1, 0.0) * max(x2 - x1, 0.0)
            ga = (g_y2x2[i, 0] - g_y1x1[i, 0]) * (g_y2x2[i, 1] - g_y1x1[i, 1])
            aa = (a_y2x2[j, 0] - a_y1x1[j, 0]) * (a_y2x2[j, 1] - a_y1x1[j, 1])
            out[i, j] = inter / (ga + aa - inter)
    return out


def tf_nms(boxes, scores, max_out, iou_threshold):
    """tf.image.non_max_suppression semantics: descending score (stable), suppress
    if IoU with any selected box > threshold."""
    order = np.argsort(-scores, kind="stable")
    selected = []
    for j in order:
        if len(selected) >= max_out:
            break
        ok = True
        for k in selected:
            if _iou1(boxes[j], boxes[k]) > iou_threshold:
                ok = False
                break
        if ok:
            selected.append(j)
    return np.asarray(selected, np.int64)


def _iou1(b1, b2):
    y1, x1 = max(b1[0], b2[0]), max(b1[1], b2[1])
    y2, x2 = min(b1[2], b2[2]), min(b1[3], b2[3])
    inter = max(y2 - y1, 0.0) * max(x2 - x1, 0.0)
    a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
    a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
    if a1 + a2 - inter == 0:
        return 0.0
    return inter / (a1 + a2 - inter)


def ssd_anchors(input_size, feat_shapes, num_levels=6):
    """SSD anchor grid oracle transcribing SSD300.py:112-119 and 323-343.

    feat_shapes: list of (fh, fw). Returns concat [A, 2]x4 (y1x1, y2x2, yx, hw).
    """
    s = [(0.2 + (0.9 - 0.2) / 5 * (i - 1)) * input_size for i in range(1, num_levels + 2)]
    pairs = [[s[i], (s[i] * s[i + 1]) ** 0.5] for i in range(num_levels)]
    ratios = [[2, 1 / 2], [2, 1 / 2, 3, 1 / 3], [2, 1 / 2, 3, 1 / 3],
              [2, 1 / 2, 3, 1 / 3], [2, 1 / 2], [2, 1 / 2]][:num_levels]
    all_y1x1, all_y2x2 = [], []
    for (fh, fw), size, ars in zip(feat_shapes, pairs, ratios):
        priors = [[size[0], size[0]], [size[1], size[1]]]
        for ar in ars:
            priors.append([size[0] * ar ** 0.5, size[0] / ar ** 0.5])
        priors = np.asarray(priors, np.float32)
        for i in range(fh):
            for j in range(fw):
                cy = (i + 0.5) * input_size / fh
                cx = (j + 0.5) * input_size / fw
                for p in priors:
                    all_y1x1.append([cy - p[0] / 2, cx - p[1] / 2])
                    all_y2x2.append([cy + p[0] / 2, cx + p[1] / 2])
    y1x1 = np.asarray(all_y1x1, np.float32)
    y2x2 = np.asarray(all_y2x2, np.float32)
    return y1x1, y2x2, (y1x1 + y2x2) / 2, y2x2 - y1x1


def smooth_l1(x):
    return np.where(np.abs(x) < 1.0, 0.5 * x * x, np.abs(x) - 0.5)


def softmax_ce(logits, label):
    m = logits.max(-1, keepdims=True)
    logz = m[..., 0] + np.log(np.exp(logits - m).sum(-1))
    return logz - np.take_along_axis(logits, np.asarray(label)[..., None], -1)[..., 0]
