"""Native (C++) data-plane helpers, loaded via ctypes.

Builds lazily with g++ on first use; falls back cleanly if no compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "tfrecord_scanner.cc")
_SO = os.path.join(_DIR, "libtfrecord_scanner.so")

_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        if not _build():
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.tfr_scan.restype = ctypes.c_int64
        lib.tfr_scan.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int]
        lib.tfr_count.restype = ctypes.c_int64
        lib.tfr_count.argtypes = [ctypes.c_char_p, ctypes.c_int]
        _lib = lib
    except OSError:
        _load_failed = True
    return _lib


def scan_tfrecord(path: str, verify_crc: bool = False
                  ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(offsets, lengths) of record payloads, or None if native unavailable.

    Raises IOError on corrupt files when verify_crc is set.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = lib.tfr_count(path.encode(), 0)
    if n == -1:
        raise IOError(f"cannot open {path}")
    if n == -2:
        raise IOError(f"malformed tfrecord {path}")
    offsets = np.zeros(n, np.int64)
    lengths = np.zeros(n, np.int64)
    got = lib.tfr_scan(
        path.encode(),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, int(verify_crc))
    if got == -2:
        raise IOError(f"corrupt tfrecord {path}")
    if got < 0:
        raise IOError(f"cannot open {path}")
    return offsets[:got], lengths[:got]


class MmapRecordFile:
    """Zero-copy random access to tfrecord payloads via mmap + native index."""

    def __init__(self, path: str, verify_crc: bool = False):
        idx = scan_tfrecord(path, verify_crc)
        if idx is None:
            raise RuntimeError("native scanner unavailable (no g++?)")
        self.offsets, self.lengths = idx
        self._mm = np.memmap(path, dtype=np.uint8, mode="r")

    def __len__(self) -> int:
        return len(self.offsets)

    def __getitem__(self, i: int) -> bytes:
        o = int(self.offsets[i])
        return self._mm[o:o + int(self.lengths[i])].tobytes()


def _bind_parse(lib: ctypes.CDLL) -> None:
    if hasattr(lib, "_parse_bound"):
        return
    lib.tfr_parse.restype = ctypes.c_int64
    lib.tfr_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
    lib._parse_bound = True


def parse_example_features(record: bytes, wanted):
    """Single-pass native tf.Example parse.

    wanted: list of (name, capacity) — capacity is the max numeric element
    count to decode (0 for bytes features). Returns
    {name: np.float32[count] | (bytes_offset, bytes_len) | None-if-absent},
    or None when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    _bind_parse(lib)
    n = len(wanted)
    names = b"\0".join(name.encode() for name, _ in wanted) + b"\0"
    bufs = [np.zeros(max(cap, 1), np.float32) for _, cap in wanted]
    fptrs = (ctypes.c_void_p * n)(
        *[b.ctypes.data_as(ctypes.c_void_p) for b in bufs])
    caps = (ctypes.c_int64 * n)(*[cap for _, cap in wanted])
    counts = (ctypes.c_int64 * n)()
    types = (ctypes.c_int32 * n)()
    boffs = (ctypes.c_int64 * n)()
    blens = (ctypes.c_int64 * n)()
    rc = lib.tfr_parse(record, len(record), names, n, fptrs, caps, counts,
                       types, boffs, blens)
    if rc < 0:
        raise IOError("malformed tf.Example record")
    out = {}
    for i, (name, cap) in enumerate(wanted):
        if types[i] == 0:
            out[name] = None
        elif types[i] == 1:
            out[name] = (int(boffs[i]), int(blens[i]))
        elif counts[i] > cap:
            # Oversized feature: the C side only decoded the first `cap`
            # elements. Return the TRUE element count (an int, not an
            # array) so callers can fail loudly instead of consuming a
            # silently truncated value.
            out[name] = int(counts[i])
        else:
            out[name] = bufs[i][:int(counts[i])]
    return out
