"""Post-mortem for a convergence run: load the saved checkpoint on CPU, run the
public inference path on a few held-out images, and dump raw-head statistics so a
near-zero mAP can be attributed (no confident predictions? boxes misplaced? decode
mismatch? eval harness?).

Usage: python scripts/diagnose_run.py MODEL [N_IMAGES]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import synthvoc
from train_convergence import DATA_ROOT, RUNS_ROOT, _load_class, model_specs


def main():
    name = sys.argv[1]
    n_img = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cls_path, (h, w), config, _, _, _ = model_specs()[name]
    config = dict(config)
    config.pop("host_feed", None)
    config["mode"] = "test"
    config["batch_size"] = 1
    model = _load_class(cls_path)(config, {"data_shape": [h, w, 3]})
    run_dir = os.path.join(RUNS_ROOT, name)
    model.load_weight(os.path.join(run_dir, "ckpt"))

    d = synthvoc.build(DATA_ROOT, h, w)
    records = list(synthvoc.test_records(d))[:n_img]

    import jax.numpy as jnp

    for i, (image, gt) in enumerate(records):
        print(f"--- image {i}  gt ({len(gt)} boxes):")
        for g in gt:
            print(f"    cls {int(g[4]):2d}  y {g[0]:6.1f}..{g[1]:6.1f}  "
                  f"x {g[2]:6.1f}..{g[3]:6.1f}  "
                  f"(h={g[1]-g[0]:.0f}, w={g[3]-g[2]:.0f})")
        scores, boxes, cids = model.test_one_image(image[None])
        order = np.argsort(-scores)[:8]
        print(f"    {len(scores)} detections; top:")
        for j in order:
            b = boxes[j]
            print(f"    cls {int(cids[j]):2d}  score {scores[j]:.3f}  "
                  f"y {b[0]:6.1f}..{b[2]:6.1f}  x {b[1]:6.1f}..{b[3]:6.1f}")

        # raw head statistics through the same forward
        imgs = jnp.asarray(image[None], jnp.float32)
        variables = {"params": model.params, "batch_stats": model.batch_stats}
        outs = model.net.apply(variables, model._preprocess(imgs), False)
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        for k, o in enumerate(outs):
            o = np.asarray(o, np.float32)
            print(f"    head {k}: shape {o.shape} "
                  f"min {o.min():.2f} max {o.max():.2f}")
            if name.startswith("CenterNet") and k == 0:
                s = 1 / (1 + np.exp(-o[0]))
                print(f"      heatmap max {s.max():.4f} #>0.3: {(s > 0.3).sum()} "
                      f"#>0.05: {(s > 0.05).sum()} mean {s.mean():.4f}")
                yy, xx, cc = np.unravel_index(s.argmax(), s.shape)
                print(f"      peak at cell ({yy},{xx}) cls {cc} -> "
                      f"pixels ({yy*4},{xx*4})")
            if name.startswith("YOLO"):
                C = model.raw_classes
                K = o.shape[-1] // (C + 5)
                v = o.reshape(o.shape[1], o.shape[2], K, C + 5)
                pobj = 1 / (1 + np.exp(-v[..., C + 4]))
                print(f"      max sigmoid(obj) {pobj.max():.4f}  "
                      f"#>0.3: {(pobj > 0.3).sum()}  #>0.05: {(pobj > 0.05).sum()}")
                yy, xx, kk = np.unravel_index(pobj.argmax(), pobj.shape)
                cell = v[yy, xx, kk]
                cls_p = 1 / (1 + np.exp(-cell[:C]))
                print(f"      argmax cell ({yy},{xx},k={kk}) "
                      f"pyx {cell[C:C+2]} phw {cell[C+2:C+4]} "
                      f"best cls {cls_p.argmax()} p {cls_p.max():.3f}")


if __name__ == "__main__":
    main()
