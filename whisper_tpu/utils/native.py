"""ctypes bridge to the native runtime library (cpp/libwhisper_tpu.so).

Gives the Python pipeline the same fast host-side IO path the C++ CLI uses
(WAV parse + windowed-sinc resample + edit distance); falls back to the pure
numpy implementations in ops/audio.py when the library isn't built.
"""

from __future__ import annotations

import ctypes
import functools
import os
from typing import Optional, Tuple

import numpy as np

_SEARCH = (
    os.path.join(os.path.dirname(__file__), "..", "..", "cpp", "build", "libwhisper_tpu.so"),
    "libwhisper_tpu.so",
)


@functools.lru_cache(maxsize=1)
def load_native() -> Optional[ctypes.CDLL]:
    path = os.environ.get("WHISPER_TPU_NATIVE_LIB")
    candidates = ([path] if path else []) + list(_SEARCH)
    for c in candidates:
        try:
            lib = ctypes.CDLL(c)
        except OSError:
            continue
        lib.wt_load_wav.restype = ctypes.c_int
        lib.wt_load_wav.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
        ]
        lib.wt_resample.restype = ctypes.c_int
        lib.wt_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.wt_edit_distance.restype = ctypes.c_int64
        lib.wt_edit_distance.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
        ]
        lib.wt_free.argtypes = [ctypes.c_void_p]
        lib.wt_last_error.restype = ctypes.c_char_p
        return lib
    return None


def native_available() -> bool:
    return load_native() is not None


def load_wav_native(data: bytes, target_rate: int = 16000) -> Tuple[np.ndarray, int]:
    """Parse+resample a WAV byte string via the native lib. Raises on error."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native lib not built")
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rate = ctypes.c_int()
    rc = lib.wt_load_wav(data, len(data), target_rate,
                         ctypes.byref(out), ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        raise ValueError(lib.wt_last_error().decode())
    try:
        arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.wt_free(out)
    return arr, rate.value


def edit_distance_native(a: str, b: str) -> int:
    lib = load_native()
    if lib is None:
        raise RuntimeError("native lib not built")
    aa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    pa = aa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    pb = bb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    return int(lib.wt_edit_distance(pa, len(aa), pb, len(bb)))
