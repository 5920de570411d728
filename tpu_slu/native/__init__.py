"""ctypes bindings for the native (C++) runtime components.

Currently: the multithreaded WAV batch decoder (``wavload.cc``). The library
is built on first use with the system ``g++`` (no pip deps); if the toolchain
or build is unavailable everything degrades gracefully to the NumPy
implementations in ``tpu_slu.data.audio``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_libwavload.so")
_SRC = os.path.join(_DIR, "wavload.cc")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO + ".tmp", _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.isfile(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.wav_decode.restype = ctypes.c_int64
        lib.wav_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.wav_info.restype = ctypes.c_int64
        lib.wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
        lib.wav_decode_batch.restype = ctypes.c_int
        lib.wav_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def wav_info(path: str):
    """(frames, sample_rate) from the header, or None."""
    lib = get_lib()
    if lib is None:
        return None
    rate = ctypes.c_int(0)
    frames = lib.wav_info(path.encode(), ctypes.byref(rate))
    if frames < 0:
        return None
    return int(frames), int(rate.value)


def read_wav_native(path: str):
    """Decode one file -> (float32 array, sample_rate), or None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    info = wav_info(path)
    if info is None:
        return None
    frames, _ = info
    out = np.empty(frames, np.float32)
    rate = ctypes.c_int(0)
    got = lib.wav_decode(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames, ctypes.byref(rate),
    )
    if got < 0:
        return None
    return out[:got], int(rate.value)


def decode_batch_native(paths: list[str], t_pad: int, num_threads: int = 0):
    """Decode ``paths`` into a zero-padded (len(paths), t_pad) float32 batch.

    Returns (batch, lengths) or None if the native library is unavailable or
    any file failed.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, t_pad), np.float32)
    lengths = np.empty(n, np.int64)
    rates = np.empty(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.wav_decode_batch(
        arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_pad,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    if failures:
        return None
    return out, lengths
