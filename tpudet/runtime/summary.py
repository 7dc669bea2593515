"""TensorBoard-format scalar summary writer, no TensorFlow dependency.

The reference merges a ``loss`` scalar summary and (only in YOLOv2) accepts an
optional writer (YOLOv2.py:305-316). This writes real TensorBoard event files using
tpudet's own protobuf encoder (tpudet.data.example_proto wire helpers) and the
TFRecord framing crc32c.

Event wire format (tensorboard.compat.proto.event_pb2.Event):
  Event { 1: wall_time(double), 2: step(int64), 5: Summary }
  Summary { 1: repeated Value { 1: tag(string), 2: simple_value(float) } }
written as TFRecord-framed records into ``events.out.tfevents.<ts>.<host>``.
"""

from __future__ import annotations

import os
import socket
import struct
import time

from tpudet.data.example_proto import _len_delim, _tag, _varint
from tpudet.data.tfrecord import TFRecordWriter


def _double_field(field: int, value: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", value)


def _float_field(field: int, value: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", value)


def _varint_field(field: int, value: int) -> bytes:
    return _tag(field, 0) + _varint(value & 0xFFFFFFFFFFFFFFFF)


def _event(step: int, tag: str | None = None, value: float | None = None,
           file_version: str | None = None) -> bytes:
    msg = _double_field(1, time.time()) + _varint_field(2, step)
    if file_version is not None:
        msg += _len_delim(3, file_version.encode())
    if tag is not None:
        v = _len_delim(1, tag.encode()) + _float_field(2, float(value))
        msg += _len_delim(5, _len_delim(1, v))
    return msg


class SummaryWriter:
    """Append scalar summaries to a TensorBoard event file under ``logdir``."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        fname = "events.out.tfevents.%d.%s" % (int(time.time()), socket.gethostname())
        self._writer = TFRecordWriter(os.path.join(logdir, fname))
        self._writer.write(_event(0, file_version="brain.Event:2"))

    def add_scalar(self, tag: str, value: float, step: int):
        self._writer.write(_event(step, tag, value))

    # reference-compatible alias (writer.add_summary(loss, global_step=...))
    def add_summary(self, value: float, global_step: int, tag: str = "loss"):
        self.add_scalar(tag, float(value), int(global_step))

    def flush(self):
        self._writer._f.flush()

    def close(self):
        self._writer.close()
