"""ctypes bindings for the native host-pipeline library (libxva_host.so).

Compiled on demand with g++ (like the reference's numba JIT compiling its MAS
kernels at import — python/fastpitch1_1/fastpitch/alignment.py:79-118). All
entry points release the GIL, so ThreadPoolExecutor fan-out gets true
parallelism. Falls back to the pure-numpy implementations when no compiler
is available."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "xva_host.cpp")
_SO = os.path.join(_DIR, "libxva_host.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    c_float_p = ctypes.POINTER(ctypes.c_float)
    lib.xva_decode_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(c_float_p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.xva_decode_wav.restype = ctypes.c_int
    lib.xva_decode_flac.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(c_float_p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.xva_decode_flac.restype = ctypes.c_int
    lib.xva_resample.argtypes = [
        c_float_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(c_float_p), ctypes.POINTER(ctypes.c_int),
    ]
    lib.xva_resample.restype = ctypes.c_int
    lib.xva_yin.argtypes = [
        c_float_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, c_float_p, ctypes.c_int,
    ]
    lib.xva_yin.restype = ctypes.c_int
    lib.xva_find_silences.argtypes = [
        c_float_p, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.xva_find_silences.restype = ctypes.c_int
    lib.xva_free.argtypes = [c_float_p]
    lib.xva_integrated_loudness.argtypes = [c_float_p, ctypes.c_int,
                                            ctypes.c_int]
    lib.xva_integrated_loudness.restype = ctypes.c_float
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def decode_wav(path: str) -> Optional[Tuple[np.ndarray, int]]:
    lib = get_lib()
    if lib is None:
        return None
    buf = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int()
    sr = ctypes.c_int()
    rc = lib.xva_decode_wav(path.encode(), ctypes.byref(buf),
                            ctypes.byref(n), ctypes.byref(sr))
    if rc != 0:
        return None
    y = np.ctypeslib.as_array(buf, shape=(n.value,)).copy()
    lib.xva_free(buf)
    return y, sr.value


def decode_flac(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """Native FLAC → (mono float32, sr); None when unbuilt or undecodable."""
    lib = get_lib()
    if lib is None:
        return None
    buf = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int()
    sr = ctypes.c_int()
    rc = lib.xva_decode_flac(path.encode(), ctypes.byref(buf),
                             ctypes.byref(n), ctypes.byref(sr))
    if rc != 0:
        return None
    y = np.ctypeslib.as_array(buf, shape=(n.value,)).copy()
    lib.xva_free(buf)
    return y, sr.value


def resample(y: np.ndarray, sr_in: int, sr_out: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    y = np.ascontiguousarray(y, np.float32)
    buf = ctypes.POINTER(ctypes.c_float)()
    n_out = ctypes.c_int()
    rc = lib.xva_resample(
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(y),
        sr_in, sr_out, ctypes.byref(buf), ctypes.byref(n_out),
    )
    if rc != 0:
        return None
    out = np.ctypeslib.as_array(buf, shape=(n_out.value,)).copy()
    lib.xva_free(buf)
    return out


def yin_f0(y: np.ndarray, sr: int, frame_length: int = 1024, hop: int = 256,
           fmin: float = 65.40639, fmax: float = 2093.0045,
           threshold: float = 0.15) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    y = np.ascontiguousarray(y, np.float32)
    max_frames = 1 + len(y) // hop + 4
    out = np.zeros(max_frames, np.float32)
    n = lib.xva_yin(
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(y), sr,
        frame_length, hop, fmin, fmax, threshold,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_frames,
    )
    return out[:n]


def find_silences(y: np.ndarray, sr: int, threshold_db: float = -40.0,
                  min_s: float = 0.3, frame: Optional[int] = None
                  ) -> Optional[List[Tuple[int, int]]]:
    lib = get_lib()
    if lib is None:
        return None
    frame = frame or int(sr * 0.02)
    y = np.ascontiguousarray(y, np.float32)
    regions = np.zeros(2048 * 2, np.int32)
    n = lib.xva_find_silences(
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(y), sr,
        threshold_db, min_s, frame,
        regions.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), 2048,
    )
    return [(int(regions[i * 2]), int(regions[i * 2 + 1])) for i in range(n)]


def integrated_loudness(y: np.ndarray, sr: int) -> Optional[float]:
    """BS.1770-4 gated loudness (LUFS), native biquad path."""
    lib = get_lib()
    if lib is None:
        return None
    y = np.ascontiguousarray(y, np.float32)
    return float(lib.xva_integrated_loudness(
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(y), sr
    ))
