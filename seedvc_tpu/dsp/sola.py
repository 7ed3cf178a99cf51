"""SOLA alignment + crossfade for the streaming pipeline.

ctypes binding to the native C++ implementation (``native/seedvc_native.cpp``)
with a numpy fallback implementing the identical algorithm — the DDSP-SVC
SOLA used by the reference realtime GUI (``real-time-gui.py:1106-1125``):
normalized cross-correlation of the new chunk's head against the previous
tail, argmax offset within the search window, then an equal-power
sin^2 fade join.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libseedvc_native.so")

_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "seedvc_native.cpp")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, src],
                    check=True, capture_output=True)
            except Exception:
                return None
        else:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        fp = ctypes.POINTER(ctypes.c_float)
        lib.sola_offset.restype = ctypes.c_int
        lib.sola_offset.argtypes = [fp, ctypes.c_int, fp, ctypes.c_int,
                                    ctypes.c_int]
        lib.crossfade_add.restype = None
        lib.crossfade_add.argtypes = [fp, fp, fp, fp, ctypes.c_int]
        lib.ring_shift_append.restype = None
        lib.ring_shift_append.argtypes = [fp, ctypes.c_int, fp, ctypes.c_int]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def sola_offset(chunk: np.ndarray, sola_buf: np.ndarray,
                search_len: int, use_native: bool = True) -> int:
    """argmax_k corr(chunk[k:k+n], sola_buf)/sqrt(energy), k in [0, search]."""
    chunk = np.ascontiguousarray(chunk, np.float32)
    sola_buf = np.ascontiguousarray(sola_buf, np.float32)
    n = len(sola_buf)
    lib = _load_native() if use_native else None
    if lib is not None:
        return int(lib.sola_offset(_fp(chunk), len(chunk), _fp(sola_buf), n,
                                   search_len))
    # numpy fallback (identical math)
    max_k = min(search_len, len(chunk) - n)
    ks = np.arange(max_k + 1)
    windows = np.lib.stride_tricks.sliding_window_view(chunk, n)[: max_k + 1]
    dots = windows @ sola_buf
    energies = (windows ** 2).sum(axis=1)
    return int(np.argmax(dots / np.sqrt(energies + 1e-8)))


def fade_windows(n: int) -> tuple[np.ndarray, np.ndarray]:
    """sin^2 fade-in and complementary fade-out (reference fade windows)."""
    t = np.linspace(0.0, 1.0, n, dtype=np.float32)
    fade_in = np.sin(0.5 * np.pi * t) ** 2
    return fade_in, 1.0 - fade_in


def crossfade_add(chunk: np.ndarray, prev_tail: np.ndarray,
                  use_native: bool = True) -> np.ndarray:
    """Fade the head of `chunk` against `prev_tail` in place; returns chunk."""
    n = len(prev_tail)
    chunk = np.ascontiguousarray(chunk, np.float32)
    fade_in, fade_out = fade_windows(n)
    lib = _load_native() if use_native else None
    if lib is not None:
        lib.crossfade_add(_fp(chunk), _fp(np.ascontiguousarray(prev_tail, np.float32)),
                          _fp(fade_in), _fp(fade_out), n)
        return chunk
    chunk[:n] = chunk[:n] * fade_in + prev_tail * fade_out
    return chunk


def ring_shift_append(ring: np.ndarray, block: np.ndarray,
                      use_native: bool = True) -> np.ndarray:
    ring = np.ascontiguousarray(ring, np.float32)
    block = np.ascontiguousarray(block, np.float32)
    lib = _load_native() if use_native else None
    if lib is not None:
        lib.ring_shift_append(_fp(ring), len(ring), _fp(block), len(block))
        return ring
    if len(block) >= len(ring):
        ring[:] = block[-len(ring):]
    else:
        ring[:-len(block)] = ring[len(block):]
        ring[-len(block):] = block
    return ring
