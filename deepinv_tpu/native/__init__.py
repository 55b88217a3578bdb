"""Native (C++) data-loading runtime.

The reference's input pipeline rides on PIL/torchvision C decoders plus
torch ``DataLoader`` worker *processes* (fork + pickle per batch). Here the
same role is played by a small C++ library (``src/imageio.cpp``): libpng /
libjpeg decoding and NCHW float32 batch assembly run in C++ *threads* —
no fork, no serialization, GIL released for the whole decode — writing into
a caller-owned numpy buffer that ``jax.device_put`` ships to the TPU.

The shared object is compiled on first use with the system ``g++`` and
cached next to this file; everything degrades gracefully to the PIL path
when a toolchain or the image libraries are unavailable
(``native_available()`` reports which).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = [
    "native_available",
    "decode_image",
    "decode_batch",
    "NativePrefetcher",
]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_native.so")
_SRC = os.path.join(_DIR, "src", "imageio.cpp")
_lock = threading.Lock()
_lib = None
_build_error = None


def _build() -> str | None:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO, "-lpng", "-ljpeg", "-lpthread",
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    except (OSError, subprocess.TimeoutExpired) as e:  # no g++ / hang
        return str(e)
    if r.returncode != 0:
        return r.stderr[-2000:]
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            err = _build()
            if err is not None:
                _build_error = err
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            _build_error = str(e)
            return None
        lib.dtpu_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.dtpu_decode.restype = ctypes.c_int
        lib.dtpu_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.dtpu_probe.restype = ctypes.c_int
        lib.dtpu_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.dtpu_decode_batch.restype = ctypes.c_int
        lib.dtpu_prefetcher_new.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.dtpu_prefetcher_new.restype = ctypes.c_void_p
        lib.dtpu_prefetcher_get.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.dtpu_prefetcher_get.restype = ctypes.c_int
        lib.dtpu_prefetcher_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    """True if the C++ loader compiled and loaded on this machine."""
    return _load() is not None


def probe_image(path: str):
    """(H, W, C) of an image file, via the native decoder."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    h = ctypes.c_int(); w = ctypes.c_int(); c = ctypes.c_int()
    if lib.dtpu_probe(path.encode(), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c)):
        raise IOError(f"cannot decode {path}")
    return h.value, w.value, c.value


def decode_image(path: str, shape=(3, 256, 256), mode: str = "resize") -> np.ndarray:
    """Decode one PNG/JPEG into a float32 CHW array in [0, 1].

    :param mode: 'resize' (bilinear to shape) or 'crop' (center crop).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    C, H, W = shape
    out = np.empty((C, H, W), np.float32)
    rc = lib.dtpu_decode(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        C, H, W, 1 if mode == "crop" else 0,
    )
    if rc:
        raise IOError(f"cannot decode {path}")
    return out


def decode_batch(paths, shape=(3, 256, 256), mode: str = "resize",
                 n_threads: int = 0) -> np.ndarray:
    """Decode N images in parallel into a float32 (N, C, H, W) batch."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    C, H, W = shape
    n = len(paths)
    out = np.empty((n, C, H, W), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    fails = lib.dtpu_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        C, H, W, 1 if mode == "crop" else 0, n_threads,
    )
    if fails:
        raise IOError(f"{fails}/{n} images failed to decode")
    return out


class NativePrefetcher:
    """Double-buffered background batch loader over a list of image paths.

    Batch ``k+1`` decodes on C++ threads while the accelerator consumes
    batch ``k`` — the role of torch DataLoader workers, without processes::

        pf = NativePrefetcher(paths, batch_size=32, shape=(3, 128, 128))
        for batch in pf:        # numpy (B, C, H, W), last may be short
            ...
    """

    def __init__(self, paths, batch_size: int, shape=(3, 256, 256),
                 mode: str = "resize", n_threads: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self._lib = lib
        self.paths = list(paths)
        self.batch_size = batch_size
        self.shape = tuple(shape)
        self.n_batches = -(-len(self.paths) // batch_size)
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        self._h = lib.dtpu_prefetcher_new(
            arr, len(self.paths), shape[0], shape[1], shape[2],
            1 if mode == "crop" else 0, batch_size, n_threads,
        )

    def get(self, batch_idx: int) -> np.ndarray:
        C, H, W = self.shape
        buf = np.empty((self.batch_size, C, H, W), np.float32)
        count = self._lib.dtpu_prefetcher_get(
            self._h, batch_idx, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return buf[:count]

    def __iter__(self):
        for i in range(self.n_batches):
            yield self.get(i)

    def __len__(self):
        return self.n_batches

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.dtpu_prefetcher_free(h)
            self._h = None
