"""TFRecord file format reader/writer — no TensorFlow dependency.

Format (tensorflow/core/lib/io/record_writer.h):
  uint64 length (LE) | uint32 masked_crc32c(length) |
  bytes  data[length] | uint32 masked_crc32c(data)

masked_crc = ((crc >> 15) | (crc << 17)) + 0xa282ead8, crc = CRC32-Castagnoli.

The CRC uses the `google_crc32c` C extension (hardware-accelerated); a pure
Python table fallback keeps the module importable anywhere.  This replaces
the reference's in-process TF reader threads (trainer.py:537-555); batching
and prefetch live in dpig_tpu/data/loader.py.
"""
from __future__ import annotations

import os
import struct
from typing import Iterator, List

try:
    import google_crc32c

    def _crc32c(data: bytes) -> int:
        return google_crc32c.value(data)
except ImportError:  # pragma: no cover - fallback
    _TABLE = []

    def _build_table():
        poly = 0x82F63B78
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ (poly if crc & 1 else 0)
            _TABLE.append(crc)

    _build_table()

    def _crc32c(data: bytes) -> int:
        crc = 0xFFFFFFFF
        for b in data:
            crc = _TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
        return crc ^ 0xFFFFFFFF


_MASK_DELTA = 0xA282EAD8


def masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF


class TFRecordWriter:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "wb")

    def write(self, record: bytes) -> None:
        header = struct.pack("<Q", len(record))
        self._f.write(header)
        self._f.write(struct.pack("<I", masked_crc(header)))
        self._f.write(record)
        self._f.write(struct.pack("<I", masked_crc(record)))

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_records(path: str, verify_crc: bool = False) -> Iterator[bytes]:
    """Stream raw records from a tfrecord file.

    Fast path: the native C++ scanner (data/_native) indexes the file in
    one pass (CRC32C in C++) and records are sliced from an mmap. Falls
    back to the pure-Python reader when no compiler is available.
    """
    try:
        from . import _native
        idx = _native.scan_tfrecord(path, verify_crc)
    except Exception:
        idx = None
    if idx is not None:
        import numpy as np
        mm = np.memmap(path, dtype=np.uint8, mode="r")
        for o, n in zip(*idx):
            yield mm[int(o):int(o) + int(n)].tobytes()
        return
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                return
            if len(header) != 8:
                raise IOError(f"truncated record header in {path}")
            (length,) = struct.unpack("<Q", header)
            (len_crc,) = struct.unpack("<I", f.read(4))
            if verify_crc and masked_crc(header) != len_crc:
                raise IOError(f"corrupt length crc in {path}")
            data = f.read(length)
            if len(data) != length:
                raise IOError(f"truncated record body in {path}")
            (data_crc,) = struct.unpack("<I", f.read(4))
            if verify_crc and masked_crc(data) != data_crc:
                raise IOError(f"corrupt record crc in {path}")
            yield data


def count_records(path: str) -> int:
    """Number of records in a tfrecord file, via header-seek only (no
    payload reads, no CRC) — cheap enough for loader init."""
    n = 0
    end = os.path.getsize(path)
    with open(path, "rb") as f:
        pos = 0
        while pos + 12 <= end:
            header = f.read(8)
            if len(header) != 8:
                break
            (length,) = struct.unpack("<Q", header)
            pos += 12 + length + 4
            if pos > end:  # truncated tail record: don't count it
                break
            f.seek(pos)
            n += 1
    return n


def list_shards(pattern_dir: str, prefix: str) -> List[str]:
    """All tfrecord shards in a directory matching `prefix*`."""
    out = sorted(
        os.path.join(pattern_dir, f) for f in os.listdir(pattern_dir)
        if f.startswith(prefix) and ".tfrecord" in f)
    return out
