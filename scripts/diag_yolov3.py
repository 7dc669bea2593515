"""Diagnose the YOLOv3 convergence-run failure: load ckpt-7000 on CPU, run
test_one_image on synthetic test scenes, dump detections vs gt, and also probe the
raw head outputs (objectness / class confidence distributions per head)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import synthvoc
from train_convergence import model_specs, _load_class, DATA_ROOT

name = "YOLOv3"
spec = model_specs()[name]
cls_path, (h, w), config, *_ = spec
config = dict(config, mode="test", batch_size=1)
model = _load_class(cls_path)(config, {"data_shape": [h, w, 3]})
model.load_weight(os.path.join(".convergence", "runs", name, "ckpt-7000.tpudet"))

d = synthvoc.build(DATA_ROOT, h, w)
records = list(synthvoc.test_records(d))[:5]

for i, (image, gt) in enumerate(records):
    import cv2

    inp = cv2.resize(np.asarray(image, np.float32), (w, h),
                     interpolation=cv2.INTER_LINEAR)
    scores, boxes, cids = model.test_one_image(inp[None])
    print(f"--- image {i}  gt:")
    for r in gt:
        print("   gt  y1x1y2x2=(%.0f %.0f %.0f %.0f) cls=%d" % (r[0], r[2], r[1], r[3], int(r[4])))
    order = np.argsort(-np.asarray(scores))[:8]
    for j in order:
        b = np.asarray(boxes[j])
        print("   det score=%.3f y1x1y2x2=(%.0f %.0f %.0f %.0f) cls=%d" % (scores[j], b[0], b[1], b[2], b[3], cids[j]))

# raw head probe on image 0
image, gt = records[0]
import cv2

inp = cv2.resize(np.asarray(image, np.float32), (w, h), interpolation=cv2.INTER_LINEAR)
import jax.numpy as jnp

x = model._preprocess(jnp.asarray(inp[None], np.float32))
outputs = model.net.apply({"params": model.params, "batch_stats": model.batch_stats},
                          x, False)
for k, o in enumerate(outputs):
    o = np.asarray(o, np.float32)
    nc = model.raw_classes
    b, fh, fw, _ = o.shape
    o = o.reshape(b, fh, fw, 3, nc + 5)
    obj = 1 / (1 + np.exp(-o[..., -1]))
    cls = 1 / (1 + np.exp(-o[..., :nc]))
    conf = obj[..., None] * cls
    hw = o[..., nc + 2:nc + 4]
    print(f"head{k+1} {fh}x{fw}: obj max={obj.max():.4f} p99={np.percentile(obj,99):.4f}"
          f"  conf max={conf.max():.4f}"
          f"  hw_h[min,max]=[{hw[...,0].min():.2f},{hw[...,0].max():.2f}]"
          f"  hw_w[min,max]=[{hw[...,1].min():.2f},{hw[...,1].max():.2f}]"
          f"  yx[min,max]=[{o[...,nc:nc+2].min():.2f},{o[...,nc:nc+2].max():.2f}]")
