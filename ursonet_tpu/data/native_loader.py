"""ctypes bridge to the native host data-loader (native/host_loader.cpp).

The C++ library does threaded JPEG/PNG decode + edge-aligned bilinear
resize + padded-batch placement — the host-side hot loop of the input
pipeline that the reference spreads over a multiprocessing pool
(reference net.py:1147-1163). One call fills a whole uint8 batch tensor.

The shared object is built on first use with g++ (cached beside the
source, rebuilt when the source is newer). Everything degrades gracefully:
`available()` is False when g++ or the image libraries are missing and
callers fall back to the PIL/numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'native',
    'host_loader.cpp')
_SO = os.path.join(os.path.dirname(_SRC), 'libursonet_host.so')

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC,
           '-o', _SO, '-ljpeg', '-lpng', '-lz', '-lpthread']
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.un_load_batch.restype = ctypes.c_int
        lib.un_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.un_decode.restype = ctypes.c_int
        lib.un_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_batch(paths, out_h: int, out_w: int, content_h: int,
               content_w: int, top: int, left: int,
               nthreads: int = 0) -> np.ndarray:
    """Decode `paths` and return a [N, out_h, out_w, 3] uint8 batch with
    each image resized to (content_h, content_w) at offset (top, left),
    zero padding elsewhere. Raises RuntimeError on a bad file."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if nthreads <= 0:
        nthreads = min(n, os.cpu_count() or 1)
    rc = lib.un_load_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w, content_h, content_w, top, left, nthreads)
    if rc:
        raise RuntimeError(f"native decode failed for {paths[rc - 1]}")
    return out


def decode(path: str, max_h: int = 4096, max_w: int = 6144) -> np.ndarray:
    """Decode one image at native resolution to RGB uint8."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    buf = np.empty((max_h * max_w * 3,), np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.un_decode(path.encode(),
                       buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       buf.size, ctypes.byref(h), ctypes.byref(w))
    if rc:
        raise RuntimeError(f"native decode failed ({rc}) for {path}")
    return buf[:h.value * w.value * 3].reshape(h.value, w.value, 3).copy()
