"""ctypes bindings for the native C++ clip decoder.

Builds ``clip_decoder.cpp`` on first use (g++ -O3, cached next to the
source; rebuilt when the source changes) and exposes:

- ``decode_frame(bytes, w, h) -> np.uint8 (h, w, 3)``
- ``decode_batch(list_of_bytes, w, h, threads) -> np.uint8 (n, h, w, 3)``

Falls back cleanly (``AVAILABLE = False``) when the toolchain or codec
libraries are missing; the data pipeline then uses PIL.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "clip_decoder.cpp")

_lib: Optional[ctypes.CDLL] = None
AVAILABLE = False
_load_lock = threading.Lock()


def _build() -> Optional[str]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "VAE2_NATIVE_CACHE", os.path.expanduser("~/.cache/vae2_tpu_native"))
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"clip_decoder_{digest}.so")
    if os.path.isfile(so_path):
        return so_path
    # unique tmp per process AND attempt: concurrent builders (other
    # processes sharing the cache) must not clobber each other's output
    # mid-write, and a timed-out first g++ may still be writing its tmp
    # when the -march-stripped retry spawns.
    tmps = [f"{so_path}.{os.getpid()}.{a}.tmp" for a in (0, 1)]
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", tmps[0], "-lpng", "-ljpeg", "-lz", "-lpthread",
    ]
    built = None
    try:
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=180)
            built = tmps[0]
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            # retry without -march=native (non-x86 or older toolchains)
            try:
                cmd_retry = [c for c in cmd if c != "-march=native"]
                cmd_retry[cmd_retry.index(tmps[0])] = tmps[1]
                subprocess.run(cmd_retry, check=True, capture_output=True,
                               timeout=180)
                built = tmps[1]
            except (subprocess.SubprocessError, FileNotFoundError, OSError):
                return so_path if os.path.isfile(so_path) else None
        try:
            os.replace(built, so_path)
        except OSError:
            if not os.path.isfile(so_path):  # lost a race AND no winner
                return None
        return so_path
    finally:
        for t in tmps:  # failure paths must not leak stale tmps; the
            try:        # successful tmp was consumed by os.replace already
                os.remove(t)
            except OSError:
                pass


def _load() -> bool:
    global _lib, AVAILABLE
    if _lib is not None:
        return AVAILABLE
    with _load_lock:
        return _load_locked()


def _load_locked() -> bool:
    global _lib, AVAILABLE
    if _lib is not None:  # another thread finished while we waited
        return AVAILABLE
    if os.environ.get("VAE2_NO_NATIVE") == "1":
        AVAILABLE = False
        _lib = ctypes.CDLL(None)  # sentinel
        return False
    try:
        so = _build()
    except OSError:
        so = None
    if so is None:
        AVAILABLE = False
        _lib = ctypes.CDLL(None)
        return False
    try:
        lib = ctypes.CDLL(so)
        lib.vae2_decode_frame.restype = ctypes.c_int
        lib.vae2_decode_frame.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.vae2_decode_batch.restype = ctypes.c_int
        lib.vae2_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        assert lib.vae2_native_version() >= 1
    except (OSError, AttributeError, AssertionError):
        AVAILABLE = False
        _lib = ctypes.CDLL(None)
        return False
    _lib = lib
    AVAILABLE = True
    return True


def decode_frame(data: bytes, width: int, height: int) -> Optional[np.ndarray]:
    """Decode+resize one encoded PNG/JPEG; None on failure."""
    if not _load():
        return None
    out = np.empty((height, width, 3), np.uint8)
    rc = _lib.vae2_decode_frame(
        data, len(data), width, height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def decode_batch(datas: List[bytes], width: int, height: int,
                 threads: int = 4) -> Optional[np.ndarray]:
    """Decode+resize a batch concurrently (GIL released for the whole batch);
    None if the native library is unavailable. Failed frames are zeros and
    reported via the return of the C call (logged by the caller)."""
    if not _load():
        return None
    n = len(datas)
    out = np.empty((n, height, width, 3), np.uint8)
    buf_array = (ctypes.c_char_p * n)(*datas)
    len_array = (ctypes.c_size_t * n)(*[len(d) for d in datas])
    _lib.vae2_decode_batch(
        buf_array, len_array, n, width, height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    return out
