"""ctypes bindings for the native C++ audio loader (native/audioio.cpp).

Batch WAV decode + resample off the GIL; CustomDataset and the prep scripts use
it when available, falling back to the scipy path transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                    "native", "audioio.cpp")
_CACHE_DIR = os.path.join(os.path.expanduser("~"), ".cache", "f5_tts_tpu")

_lib = None
_failed = False


def _ensure() -> bool:
    global _lib, _failed
    if _lib is not None:
        return True
    if _failed or not os.path.isfile(_SRC):
        return False
    so_path = os.path.join(_CACHE_DIR, "libaudioio.so")
    if not (os.path.isfile(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC)):
        os.makedirs(_CACHE_DIR, exist_ok=True)
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", _SRC, "-o", so_path],
                check=True, capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            warnings.warn(f"native audioio build failed ({e}); using scipy loader")
            _failed = True
            return False
    lib = ctypes.CDLL(so_path)
    lib.wav_read_mono.restype = ctypes.c_long
    lib.wav_read_mono.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_long, ctypes.POINTER(ctypes.c_int)]
    lib.resample_poly_c.restype = ctypes.c_long
    lib.resample_poly_c.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                                    ctypes.c_int, ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    lib.load_batch_mono.restype = ctypes.c_int
    lib.load_batch_mono.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                                    ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_long, ctypes.POINTER(ctypes.c_long), ctypes.c_int]
    _lib = lib
    return True


def native_available() -> bool:
    return _ensure()


def load_wav_mono(path: str) -> tuple[np.ndarray, int] | None:
    """Native single-file load; None if unsupported (caller falls back)."""
    if not _ensure():
        return None
    sr = ctypes.c_int(0)
    n = _lib.wav_read_mono(path.encode(), None, 0, ctypes.byref(sr))
    if n < 0:
        return None
    buf = np.empty(n, np.float32)
    got = _lib.wav_read_mono(path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                             n, ctypes.byref(sr))
    if got < 0:
        return None
    return buf[:got], int(sr.value)


def load_batch(paths: list[str], target_sr: int, max_seconds: float = 35.0,
               n_threads: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Threaded batch decode+resample.  Returns (wavs [n, stride], lens [n];
    lens[i] == -1 marks an unreadable file)."""
    if not _ensure():
        raise RuntimeError("native audio loader unavailable")
    n = len(paths)
    stride = int(max_seconds * target_sr)
    out = np.zeros((n, stride), np.float32)
    lens = np.zeros(n, np.int64)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    _lib.load_batch_mono(arr, n, target_sr,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                         stride, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), n_threads)
    return out, lens
