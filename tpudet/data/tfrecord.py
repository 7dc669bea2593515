"""TFRecord container IO without TensorFlow.

Wire format (what tf.python_io.TFRecordWriter emits, tfrecord_voc_utils.py:81):
  uint64 length | uint32 masked_crc32c(length) | bytes data | uint32 masked_crc32c(data)
with ``masked_crc = rotr(crc32c(x), 15) + 0xa282ead8``.

crc32c runs in a small native C library (native/crc32c.c, built on demand with g++ and
loaded via ctypes); a pure-NumPy table fallback keeps everything working without a
compiler. Readers can skip checksum verification (default) for speed.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Iterator, List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libtpudet_native.so")

_native = None


def _load_native():
    global _native
    if _native is not None:
        return _native
    src = os.path.join(_NATIVE_DIR, "crc32c.c")
    if not os.path.exists(_SO_PATH) and os.path.exists(src):
        # compile to a process-unique temp name and os.rename() into place:
        # rename is atomic, so concurrent processes (multi-host training,
        # parallel pytest) never CDLL a partially written .so
        tmp = f"{_SO_PATH}.{os.getpid()}.tmp"
        try:
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", src, "-o", tmp],
                check=True, capture_output=True,
            )
            os.rename(tmp, _SO_PATH)
        except Exception:
            try:
                os.unlink(tmp)
            except OSError:
                pass
    if os.path.exists(_SO_PATH):
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.tpudet_crc32c.restype = ctypes.c_uint32
            lib.tpudet_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                          ctypes.c_uint32]
            _native = lib
            return lib
        except OSError:
            pass
    _native = False
    return False


_PY_TABLE: Optional[np.ndarray] = None


def _py_table() -> np.ndarray:
    global _PY_TABLE
    if _PY_TABLE is None:
        poly = np.uint32(0x82F63B78)
        t = np.zeros(256, np.uint32)
        for i in range(256):
            crc = np.uint32(i)
            for _ in range(8):
                crc = (crc >> np.uint32(1)) ^ (poly if crc & np.uint32(1) else np.uint32(0))
            t[i] = crc
        _PY_TABLE = t
    return _PY_TABLE


def crc32c(data: bytes, seed: int = 0) -> int:
    lib = _load_native()
    if lib:
        return lib.tpudet_crc32c(data, len(data), seed)
    t = _py_table()
    crc = np.uint32(seed ^ 0xFFFFFFFF)
    arr = np.frombuffer(data, np.uint8)
    for b in arr:
        crc = t[(crc ^ b) & np.uint32(0xFF)] ^ (crc >> np.uint32(8))
    return int(crc ^ np.uint32(0xFFFFFFFF))


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


class TFRecordWriter:
    """Context-managed writer mirroring tf.python_io.TFRecordWriter."""

    def __init__(self, path: str):
        self._f = open(path, "wb")

    def write(self, record: bytes):
        header = struct.pack("<Q", len(record))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(record)
        self._f.write(struct.pack("<I", _masked_crc(record)))

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_records(path: str, verify: bool = False) -> Iterator[bytes]:
    """Yield raw record payloads from one TFRecord file."""
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            if verify:
                if _masked_crc(header) != hcrc or _masked_crc(data) != dcrc:
                    raise IOError(f"corrupt TFRecord in {path}")
            yield data


def index_records(path: str) -> List[tuple]:
    """Byte offsets/lengths of every record — enables O(1) random access reads
    (the pipeline shuffles indices instead of maintaining a shuffle buffer)."""
    out = []
    with open(path, "rb") as f:
        pos = 0
        while True:
            header = f.read(8)
            if len(header) < 8:
                return out
            (length,) = struct.unpack("<Q", header)
            out.append((pos + 12, length))
            pos += 16 + length
            f.seek(pos)


def read_record_at(path_handle, offset: int, length: int) -> bytes:
    path_handle.seek(offset)
    return path_handle.read(length)
