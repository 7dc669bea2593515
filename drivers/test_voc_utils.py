"""VOC TFRecord conversion driver (reference: utils/test_voc_utils.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpudet.data import voc

if __name__ == "__main__":
    tfrecords = voc.dataset2tfrecord(
        "./VOC2007/Annotations/", "./VOC2007/JPEGImages/", "./data/", "train", 5)
    print(tfrecords)
