"""Pascal-VOC dataset authoring + record parsing (tfrecord_voc_utils.py rebuilt).

``dataset2tfrecord(xml_dir, img_dir, output_dir, name, total_shards)`` keeps the
reference's public signature and record schema (tfrecord_voc_utils.py:33-92):
  image        -> raw JPEG bytes
  shape        -> int32[3] (h, w, depth) raw bytes
  ground_truth -> float32[N, 5] rows of [ymin, ymax, xmin, xmax, class_id] raw bytes

so shards written here are interchangeable with ones written by the reference's TF
code and vice versa.
"""

from __future__ import annotations

import io
import math
import os
import sys
import warnings
from glob import glob
from typing import Dict, List

import numpy as np

from tpudet.data import example_proto, tfrecord
from tpudet.data.classes import classname_to_ids


def xml_to_features(xmlpath: str, imgpath: str) -> Dict[str, list]:
    from lxml import etree

    root = etree.parse(xmlpath).getroot()
    imgname = os.path.join(imgpath, root.find("filename").text)
    with open(imgname, "rb") as f:
        image = f.read()
    size = root.find("size")
    shape = np.asarray(
        [int(size.find("height").text), int(size.find("width").text),
         int(size.find("depth").text)], np.int32)
    objs = root.findall("object")
    gt = np.zeros([len(objs), 5], np.float32)
    for i, obj in enumerate(objs):
        box = obj.find("bndbox")
        gt[i] = [float(box.find("ymin").text), float(box.find("ymax").text),
                 float(box.find("xmin").text), float(box.find("xmax").text),
                 classname_to_ids[obj.find("name").text]]
    return {
        "image": [image],
        "shape": [shape.tobytes()],
        "ground_truth": [gt.tobytes()],
    }


def dataset2tfrecord(xml_dir: str, img_dir: str, output_dir: str, name: str,
                     total_shards: int = 5) -> List[str]:
    if not os.path.exists(output_dir):
        os.makedirs(output_dir)
        print(output_dir, "does not exist, create it done")
    elif os.listdir(output_dir):
        warnings.warn(output_dir + " is not empty!", UserWarning)
    outputfiles = []
    xmllist = sorted(glob(os.path.join(xml_dir, "*.xml")))
    num_per_shard = int(math.ceil(len(xmllist) / float(total_shards)))
    for shard_id in range(total_shards):
        outputname = os.path.join(
            output_dir, "%s_%05d-of-%05d.tfrecord" % (name, shard_id + 1, total_shards))
        outputfiles.append(outputname)
        with tfrecord.TFRecordWriter(outputname) as writer:
            lo = shard_id * num_per_shard
            hi = min((shard_id + 1) * num_per_shard, len(xmllist))
            for i in range(lo, hi):
                sys.stdout.write("\r>> Converting image %d/%d shard %d/%d" % (
                    i + 1, len(xmllist), shard_id + 1, total_shards))
                sys.stdout.flush()
                writer.write(example_proto.encode_example(
                    xml_to_features(xmllist[i], img_dir)))
            sys.stdout.write("\n")
    return outputfiles


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 RGB HWC array.

    Uses OpenCV (libjpeg-turbo, ~3x faster than PIL — the decode dominates the
    host-side pipeline cost) with a PIL fallback.
    """
    try:
        import cv2

        arr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if arr is not None:
            return arr[:, :, ::-1]  # BGR -> RGB
    except ImportError:
        pass
    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        return np.asarray(im.convert("RGB"))


def parse_voc_record(record: bytes):
    """One serialized Example -> (image f32 HWC, shape int32[3], gt [N,5] corner fmt)."""
    feats = example_proto.decode_example(record)
    shape = np.frombuffer(feats["shape"][0], np.int32)
    gt = np.frombuffer(feats["ground_truth"][0], np.float32).reshape(-1, 5).copy()
    image = decode_jpeg(feats["image"][0]).astype(np.float32)
    return image, shape, gt
