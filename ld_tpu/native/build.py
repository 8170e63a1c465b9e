"""Build + load the native components (ctypes, no pybind11 in this image)."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_HERE, 'libcocomatch.so')
_SRC = os.path.join(_HERE, 'coco_match.cpp')

_cached: Optional[ctypes.CDLL] = None
_failed = False


def build(force: bool = False) -> Optional[str]:
    if os.path.exists(_LIB) and not force and \
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = ['g++', '-O3', '-shared', '-fPIC', _SRC, '-o', _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def load_cocomatch() -> Optional[ctypes.CDLL]:
    """The compiled matcher, or None (callers fall back to numpy)."""
    global _cached, _failed
    if _cached is not None or _failed:
        return _cached
    path = build()
    if path is None:
        _failed = True
        return None
    lib = ctypes.CDLL(path)
    d = ctypes.POINTER(ctypes.c_double)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    i64 = ctypes.c_int64
    lib.coco_match.argtypes = [d, i64, d, u8, u8, i64, d, i64, d, u8, u8]
    lib.coco_match.restype = None
    _cached = lib
    return lib


if __name__ == '__main__':
    out = build(force=True)
    print(out or 'build failed')
