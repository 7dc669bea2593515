"""Data subsystem tests: crc32c, Example proto, TFRecord framing (cross-checked
against real TensorFlow where available), VOC authoring + pipeline, augmentor."""

import io
import os

import numpy as np
import pytest

from tpudet.data import example_proto, tfrecord, voc
from tpudet.data.augment import image_augmentor
from tpudet.data.pipeline import VOCLoader, get_generator


def _tf():
    tf = pytest.importorskip("tensorflow")
    return tf


class TestCRC32C:
    def test_known_answer(self):
        # canonical check value for CRC-32C
        assert tfrecord.crc32c(b"123456789") == 0xE3069283

    def test_native_matches_python(self):
        data = bytes(range(256)) * 7 + b"tail"
        native = tfrecord.crc32c(data)
        # force python fallback
        lib = tfrecord._native
        tfrecord._native = False
        try:
            assert tfrecord.crc32c(data) == native
        finally:
            tfrecord._native = lib


class TestExampleProto:
    def test_roundtrip(self):
        feats = {
            "image": [b"\x01\x02jpegbytes"],
            "floats": [1.5, -2.25, 3.0],
            "label": [7, -3, 2**40],
        }
        buf = example_proto.encode_example(feats)
        out = example_proto.decode_example(buf)
        assert out["image"] == feats["image"]
        np.testing.assert_allclose(out["floats"], feats["floats"])
        assert out["label"] == feats["label"]

    def test_tf_parses_our_bytes(self):
        tf = _tf()
        buf = example_proto.encode_example({
            "image": [b"abc"], "shape": [np.asarray([1, 2, 3], np.int32).tobytes()],
            "label": [42],
        })
        ex = tf.train.Example.FromString(buf)
        assert ex.features.feature["image"].bytes_list.value[0] == b"abc"
        assert ex.features.feature["label"].int64_list.value[0] == 42

    def test_we_parse_tf_bytes(self):
        tf = _tf()
        ex = tf.train.Example(features=tf.train.Features(feature={
            "image": tf.train.Feature(bytes_list=tf.train.BytesList(value=[b"xyz"])),
            "f": tf.train.Feature(float_list=tf.train.FloatList(value=[0.5, 1.5])),
            "label": tf.train.Feature(int64_list=tf.train.Int64List(value=[9])),
        }))
        out = example_proto.decode_example(ex.SerializeToString())
        assert out["image"] == [b"xyz"]
        np.testing.assert_allclose(out["f"], [0.5, 1.5])
        assert out["label"] == [9]


class TestTFRecordFraming:
    def test_roundtrip_and_index(self, tmp_path):
        p = str(tmp_path / "a.tfrecord")
        recs = [b"one", b"two two", b"x" * 1000]
        with tfrecord.TFRecordWriter(p) as w:
            for r in recs:
                w.write(r)
        assert list(tfrecord.read_records(p, verify=True)) == recs
        idx = tfrecord.index_records(p)
        assert len(idx) == 3
        with open(p, "rb") as f:
            f.seek(idx[2][0])
            assert f.read(idx[2][1]) == recs[2]

    def test_tf_reads_our_file(self, tmp_path):
        tf = _tf()
        p = str(tmp_path / "b.tfrecord")
        with tfrecord.TFRecordWriter(p) as w:
            w.write(b"hello tf")
        got = [bytes(x.numpy()) for x in tf.data.TFRecordDataset([p])]
        assert got == [b"hello tf"]

    def test_we_read_tf_file(self, tmp_path):
        tf = _tf()
        p = str(tmp_path / "c.tfrecord")
        with tf.io.TFRecordWriter(p) as w:
            w.write(b"hello tpudet")
        assert list(tfrecord.read_records(p, verify=True)) == [b"hello tpudet"]


def _make_voc_dataset(root, n=6, hw=(80, 100)):
    from PIL import Image

    xml_dir = os.path.join(root, "ann")
    img_dir = os.path.join(root, "img")
    os.makedirs(xml_dir)
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    for i in range(n):
        name = f"im{i:03d}.jpg"
        arr = rng.integers(0, 255, (hw[0], hw[1], 3), np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, name))
        objs = ""
        for _ in range(rng.integers(1, 4)):
            y1, x1 = rng.integers(0, hw[0] - 20), rng.integers(0, hw[1] - 20)
            h, w = rng.integers(10, 20), rng.integers(10, 20)
            objs += f"""
  <object><name>dog</name><bndbox><ymin>{y1}</ymin><ymax>{y1+h}</ymax><xmin>{x1}</xmin><xmax>{x1+w}</xmax></bndbox></object>"""
        with open(os.path.join(xml_dir, f"im{i:03d}.xml"), "w") as f:
            f.write(f"""<annotation><filename>{name}</filename>
<size><height>{hw[0]}</height><width>{hw[1]}</width><depth>3</depth></size>{objs}
</annotation>""")
    return xml_dir, img_dir


class TestVOCPipeline:
    def test_end_to_end(self, tmp_path):
        xml_dir, img_dir = _make_voc_dataset(str(tmp_path))
        out = voc.dataset2tfrecord(xml_dir, img_dir, str(tmp_path / "rec"), "voc",
                                   total_shards=2)
        assert len(out) == 2 and all(os.path.exists(p) for p in out)
        image, shape, gt = voc.parse_voc_record(next(tfrecord.read_records(out[0])))
        assert tuple(shape) == (80, 100, 3)
        assert image.shape == (80, 100, 3) and gt.shape[1] == 5
        assert (gt[:, 4] == 11).all()  # 'dog'

        cfg = {
            "data_format": "channels_last",
            "output_shape": [64, 64],
            "crop_method": "random",
            "flip_prob": [0.2, 0.5],
            "fill_mode": "BILINEAR",
            "keep_aspect_ratios": False,
            "constant_values": 0.0,
            "color_jitter_prob": 0.5,
            "rotate": [0.3, -5.0, 5.0],
            "pad_truth_to": 10,
        }
        init, it = get_generator(out, 4, 100, cfg, seed=0)
        images, gts = next(it)
        assert images.shape == (4, 64, 64, 3) and gts.shape == (4, 10, 5)
        for b in range(4):
            g = gts[b]
            real = g[g[:, 0] >= 0]
            assert len(real) >= 1
            # center format within frame, padding is -1
            assert (real[:, 0] > 0).all() and (real[:, 0] < 63).all()
            assert (real[:, 1] > 0).all() and (real[:, 1] < 63).all()
            assert (real[:, 2] >= 0).all() and (real[:, 3] >= 0).all()
            pad_rows = g[g[:, 0] < 0]
            assert (pad_rows == -1).all()
        it.close()


class TestAugmentor:
    def _img(self, h=40, w=60):
        return np.arange(h * w * 3, dtype=np.float32).reshape(h, w, 3) % 251

    def test_plain_resize_and_gt_scale(self):
        img = self._img()
        gt = np.asarray([[10, 30, 12, 36, 2]], np.float32)  # ymin ymax xmin xmax cid
        out, g = image_augmentor(
            image=img, input_shape=(40, 60, 3), data_format="channels_last",
            output_shape=[80, 120], fill_mode="BILINEAR", ground_truth=gt,
            pad_truth_to=5, rng=np.random.default_rng(0))
        assert out.shape == (80, 120, 3)
        real = g[0]
        np.testing.assert_allclose(real, [40, 48, 40, 48, 2], atol=1e-4)
        assert (g[1:] == -1).all()

    def test_lr_flip_box_remap(self):
        img = self._img(32, 32)
        gt = np.asarray([[4, 12, 2, 10, 0]], np.float32)
        out, g = image_augmentor(
            image=img, input_shape=(32, 32, 3), data_format="channels_last",
            output_shape=[32, 32], fill_mode="BILINEAR", flip_prob=[0.0, 1.0],
            ground_truth=gt, pad_truth_to=3, rng=np.random.default_rng(0))
        # x: [2,10] -> [32-10-1, 32-2-1] = [21, 29] -> center 25, w 8
        np.testing.assert_allclose(g[0], [8, 25, 8, 8, 0], atol=1e-4)
        np.testing.assert_allclose(out[:, :, 0], img[:, ::-1, 0], atol=1e-4)

    def test_align_corners_bilinear_matches_tf(self):
        tf = _tf()
        img = self._img(13, 17)
        ours = image_augmentor(
            image=img, input_shape=(13, 17, 3), data_format="channels_last",
            output_shape=[29, 23], fill_mode="BILINEAR",
            rng=np.random.default_rng(0))
        want = tf.compat.v1.image.resize_images(
            img, [29, 23], tf.image.ResizeMethod.BILINEAR, align_corners=True
        ).numpy()
        np.testing.assert_allclose(ours, want, atol=1e-3)

    def test_zero_box_fallback(self):
        img = self._img(40, 40)
        # box whose center lands on the border after clip -> dropped -> fallback
        gt = np.asarray([[0, 0, 0, 0, 1]], np.float32)
        out, g = image_augmentor(
            image=img, input_shape=(40, 40, 3), data_format="channels_last",
            output_shape=[20, 20], fill_mode="BILINEAR", ground_truth=gt,
            pad_truth_to=4, rng=np.random.default_rng(0))
        assert out.shape == (20, 20, 3)
        # fallback resizes original and scales original centers by 0.5
        np.testing.assert_allclose(g[0], [0, 0, 0, 0, 1], atol=1e-5)

    def test_channels_first_roundtrip(self):
        img = self._img(24, 24).transpose(2, 0, 1)
        gt = np.asarray([[4, 12, 4, 12, 3]], np.float32)
        out, g = image_augmentor(
            image=img, input_shape=(24, 24, 3), data_format="channels_first",
            output_shape=[24, 24], fill_mode="BILINEAR", ground_truth=gt,
            pad_truth_to=2, rng=np.random.default_rng(0))
        assert out.shape == (3, 24, 24)
