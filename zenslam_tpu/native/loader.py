"""ctypes bindings for the native loader (PNG decode + threaded prefetch).

Builds libzenslam_native.so from the C++ sources on first use (g++ -O3,
cached next to the sources). No pybind11 in this image — plain C ABI.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libzenslam_native.so")
_SOURCES = [os.path.join(_DIR, "png_decode.cpp"), os.path.join(_DIR, "prefetch.cpp")]
_lock = threading.Lock()
_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           *_SOURCES, "-lz", "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        newest_src = max(os.path.getmtime(s) for s in _SOURCES)
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < newest_src:
            _build()
        lib = ctypes.CDLL(_SO)
        lib.zs_decode_png_gray.restype = ctypes.c_int
        lib.zs_decode_png_gray.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.zs_free.argtypes = [ctypes.c_void_p]
        lib.zs_reader_create.restype = ctypes.c_void_p
        lib.zs_reader_create.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.zs_reader_next.restype = ctypes.c_int
        lib.zs_reader_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.zs_reader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def decode_png_gray(path: str) -> np.ndarray:
    """Decode a PNG file to a grayscale uint8/uint16 array."""
    lib = _get_lib()
    data = open(path, "rb").read()
    out = ctypes.POINTER(ctypes.c_uint8)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    depth = ctypes.c_int()
    rc = lib.zs_decode_png_gray(data, len(data), ctypes.byref(out),
                                ctypes.byref(w), ctypes.byref(h), ctypes.byref(depth))
    if rc != 0:
        raise ValueError(f"PNG decode failed ({rc}): {path}")
    n = w.value * h.value
    if depth.value == 8:
        arr = np.ctypeslib.as_array(out, shape=(n,)).copy().reshape(h.value, w.value)
    else:
        arr16 = ctypes.cast(out, ctypes.POINTER(ctypes.c_uint16))
        arr = np.ctypeslib.as_array(arr16, shape=(n,)).copy().reshape(h.value, w.value)
    lib.zs_free(ctypes.cast(out, ctypes.c_void_p))
    return arr


class PrefetchReader:
    """Ordered stereo-frame prefetcher over native worker threads
    (≡ reader_thread, `io/reader_thread.h`)."""

    def __init__(self, left_paths, right_paths, width: int, height: int,
                 queue_cap: int = 4, n_threads: int = 2):
        assert len(left_paths) == len(right_paths)
        self._lib = _get_lib()
        self._n = len(left_paths)
        self._w, self._h = width, height
        blob_l = "\n".join(left_paths).encode()
        blob_r = "\n".join(right_paths).encode()
        self._handle = self._lib.zs_reader_create(blob_l, blob_r, self._n,
                                                  queue_cap, n_threads)

    def __iter__(self):
        try:
            while True:
                left = np.empty((self._h, self._w), np.float32)
                right = np.empty((self._h, self._w), np.float32)
                rc = self._lib.zs_reader_next(
                    self._handle,
                    left.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    right.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    self._w * self._h,
                )
                if rc == -1:
                    return
                if rc < 0:
                    raise RuntimeError(f"prefetch reader error {rc}")
                yield rc, left, right
        finally:
            self.close()

    def close(self):
        if self._handle:
            self._lib.zs_reader_destroy(self._handle)
            self._handle = None
