"""ctypes bindings for the native audio frontend (libgwt_audio.so).

Builds on demand (``make -C godot_whisper_tpu/native``) and falls back to
the NumPy implementations in audio/ when the toolchain or library is
unavailable — every entry point here has an identical-semantics Python
twin, which the tests cross-check.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libgwt_audio.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library(build: bool = True) -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried and not build:
        return None
    _tried = True
    if not os.path.exists(_LIB_PATH):
        if not (build and _build()):
            return None
    lib = ctypes.CDLL(_LIB_PATH)

    f32p = ctypes.POINTER(ctypes.c_float)
    lib.gwt_ring_new.restype = ctypes.c_void_p
    lib.gwt_ring_new.argtypes = [ctypes.c_uint64]
    lib.gwt_ring_free.argtypes = [ctypes.c_void_p]
    lib.gwt_ring_push.restype = ctypes.c_uint64
    lib.gwt_ring_push.argtypes = [ctypes.c_void_p, f32p, ctypes.c_uint64]
    lib.gwt_ring_pop.restype = ctypes.c_uint64
    lib.gwt_ring_pop.argtypes = [ctypes.c_void_p, f32p, ctypes.c_uint64]
    lib.gwt_ring_available.restype = ctypes.c_uint64
    lib.gwt_ring_available.argtypes = [ctypes.c_void_p]

    lib.gwt_resampler_new.restype = ctypes.c_void_p
    lib.gwt_resampler_new.argtypes = [ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int]
    lib.gwt_resampler_free.argtypes = [ctypes.c_void_p]
    lib.gwt_resample.restype = ctypes.c_uint64
    lib.gwt_resample.argtypes = [ctypes.c_void_p, f32p, ctypes.c_uint64,
                                 f32p]

    lib.gwt_vad_simple.restype = ctypes.c_int
    lib.gwt_vad_simple.argtypes = [f32p, ctypes.c_uint64, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_float,
                                   ctypes.c_float]

    lib.gwt_signal_energy.argtypes = [f32p, ctypes.c_uint64, ctypes.c_int,
                                      f32p]
    lib.gwt_mixdown_stereo.argtypes = [f32p, ctypes.c_uint64, f32p]

    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def _as_f32(x: np.ndarray):
    x = np.ascontiguousarray(x, dtype=np.float32)
    return x, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeRing:
    """SPSC ring buffer backed by the native library."""

    def __init__(self, capacity: int):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.gwt_ring_new(capacity)

    def push(self, data: np.ndarray) -> int:
        arr, ptr = _as_f32(data)
        return int(self._lib.gwt_ring_push(self._h, ptr, len(arr)))

    def pop(self, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.float32)
        _, ptr = _as_f32(out)
        got = int(self._lib.gwt_ring_pop(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n))
        return out[:got]

    @property
    def available(self) -> int:
        return int(self._lib.gwt_ring_available(self._h))

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.gwt_ring_free(self._h)
            self._h = None


def native_resample(x: np.ndarray, src_rate: int, dst_rate: int,
                    taps_per_phase: int = 16) -> np.ndarray:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    rs = lib.gwt_resampler_new(src_rate, dst_rate, taps_per_phase)
    try:
        arr, ptr = _as_f32(x)
        n_out = int(np.ceil(len(arr) * dst_rate / src_rate)) + 8
        out = np.empty(n_out, dtype=np.float32)
        got = int(lib.gwt_resample(
            rs, ptr, len(arr),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))))
        return out[:got]
    finally:
        lib.gwt_resampler_free(rs)


def native_vad_simple(pcm: np.ndarray, sample_rate: int = 16000,
                      last_ms: int = 1000, vad_thold: float = 0.3,
                      freq_thold: float = 200.0) -> bool:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    arr, ptr = _as_f32(pcm)
    return bool(lib.gwt_vad_simple(ptr, len(arr), sample_rate, last_ms,
                                   vad_thold, freq_thold))


def native_signal_energy(x: np.ndarray, half_window: int = 32) -> np.ndarray:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    arr, ptr = _as_f32(x)
    out = np.empty(len(arr), dtype=np.float32)
    lib.gwt_signal_energy(
        ptr, len(arr), half_window,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
