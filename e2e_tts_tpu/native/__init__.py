"""Native (C++) runtime components, loaded through ctypes.

Currently: the YIN pitch extractor hot loop (``yin.cc``).  Libraries are
built on demand (``python -m e2e_tts_tpu.native.build``); every consumer has
a NumPy fallback so the package works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from .build import build, lib_path

_LIBS = {}


def load(name: str, auto_build: bool = True) -> Optional[ctypes.CDLL]:
    if name in _LIBS:
        return _LIBS[name]
    path = lib_path(name)
    if not os.path.exists(path):
        if not auto_build:
            return None
        try:
            build(name)
        except Exception:
            _LIBS[name] = None
            return None
    try:
        _LIBS[name] = ctypes.CDLL(path)
    except OSError:
        _LIBS[name] = None
    return _LIBS[name]


def native_yin_f0(
    audio: np.ndarray,
    sample_rate: int,
    hop_length: int,
    fmin: float = 80.0,
    fmax: float = 750.0,
    frame_length: int = 2048,
    threshold: float = 0.2,
) -> Optional[np.ndarray]:
    """C++ YIN; returns None when the native lib is unavailable."""
    lib = load("yin")
    if lib is None:
        return None
    fn = lib.yin_f0
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_double, ctypes.POINTER(ctypes.c_float),
    ]
    x = np.ascontiguousarray(audio, np.float32)
    padded = len(x) + frame_length  # matches the kernel's pad arithmetic
    n_frames = max(0, 1 + (padded - frame_length) // hop_length)
    out = np.zeros(n_frames, np.float32)
    written = fn(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(x)),
        sample_rate,
        hop_length,
        fmin,
        fmax,
        frame_length,
        threshold,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out[:written].astype(np.float64)
