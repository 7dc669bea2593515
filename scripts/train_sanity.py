"""End-to-end learning sanity on real hardware: synthetic VOC dataset -> TFRecords ->
pipeline -> SSD300 training on the TPU -> train-set mAP.

Generates images with solid colored rectangles on noise; each color is a class. A
few hundred steps of training from random init must drive the loss down sharply and
produce a non-trivial train-set mAP — evidence the full user path (data authoring,
augmentor, input pipeline, DP train step, decode, eval) learns end to end.

Run: python scripts/train_sanity.py [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

COLORS = {
    0: (220, 40, 40),   # class 'aeroplane' <- red boxes
    1: (40, 220, 40),   # 'bicycle' <- green
    2: (40, 40, 220),   # 'bird' <- blue
}


def make_dataset(root, n=256, size=300):
    from PIL import Image

    from tpudet.data.classes import VOC_CLASSES

    xml_dir = os.path.join(root, "ann")
    img_dir = os.path.join(root, "img")
    os.makedirs(xml_dir, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(90, 160, (size, size, 3), np.uint8)
        objs = ""
        for _ in range(int(rng.integers(1, 4))):
            cid = int(rng.integers(0, len(COLORS)))
            h, w = int(rng.integers(60, 140)), int(rng.integers(60, 140))
            y1 = int(rng.integers(0, size - h))
            x1 = int(rng.integers(0, size - w))
            arr[y1:y1 + h, x1:x1 + w] = COLORS[cid]
            objs += (f"<object><name>{VOC_CLASSES[cid]}</name><bndbox>"
                     f"<ymin>{y1}</ymin><ymax>{y1 + h}</ymax>"
                     f"<xmin>{x1}</xmin><xmax>{x1 + w}</xmax></bndbox></object>")
        name = f"im{i:04d}.jpg"
        Image.fromarray(arr).save(os.path.join(img_dir, name), quality=95)
        with open(os.path.join(xml_dir, f"im{i:04d}.xml"), "w") as f:
            f.write(f"<annotation><filename>{name}</filename><size>"
                    f"<height>{size}</height><width>{size}</width>"
                    f"<depth>3</depth></size>{objs}</annotation>")
    return xml_dir, img_dir


def main(steps=300):
    from tpudet.data import pipeline, tfrecord, voc
    from tpudet.models import SSD300
    from tpudet.runtime import evaluate

    root = "/tmp/tpudet_sanity"
    if not os.path.exists(os.path.join(root, "rec")):
        print("generating synthetic VOC dataset ...")
        xml_dir, img_dir = make_dataset(root)
        records = voc.dataset2tfrecord(xml_dir, img_dir, os.path.join(root, "rec"),
                                       "sanity", total_shards=2)
    else:
        records = [os.path.join(root, "rec", f)
                   for f in sorted(os.listdir(os.path.join(root, "rec")))]

    batch = 32
    aug = {
        "data_format": "channels_last", "output_shape": [300, 300],
        "flip_prob": [0.0, 0.5], "fill_mode": "BILINEAR",
        "keep_aspect_ratios": False, "constant_values": 0.0, "pad_truth_to": 60,
    }
    gen = pipeline.get_generator(records, batch, 256, aug, seed=0)
    provider = {"data_shape": [300, 300, 3], "num_train": batch * steps,
                "num_val": 0, "train_generator": gen, "val_generator": None}
    config = {
        "mode": "train", "data_format": "channels_last", "num_classes": 20,
        "weight_decay": 1e-4, "keep_prob": 0.5, "batch_size": batch,
        "nms_score_threshold": 0.3, "nms_max_boxes": 20, "nms_iou_threshold": 0.45,
        "pretraining_weight": None, "compute_dtype": "bfloat16",
    }
    model = SSD300(config, provider)
    t0 = time.time()
    mean_loss = model.train_one_epoch(1e-3)
    print(f"\ntrained {steps} steps in {time.time() - t0:.0f}s, mean loss {mean_loss:.3f}")
    gen[1].close()

    # train-set mAP on a held slice of records
    eval_records = []
    for rec in tfrecord.read_records(records[0]):
        image, shape, gt = voc.parse_voc_record(rec)
        eval_records.append((image, gt))
        if len(eval_records) >= 32:
            break
    mAP, aps = evaluate.evaluate_model(model, eval_records)
    print({"steps": steps, "mean_loss": round(float(mean_loss), 3),
           "train_mAP@0.5": round(mAP, 4),
           "per_class_AP": {k: round(v, 3) for k, v in aps.items()}})


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
