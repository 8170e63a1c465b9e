"""Build + load the native components (ctypes, no pybind11 in this image)."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))

_cached: dict = {}
_failed: set = set()


def _build_one(src_name: str, lib_name: str, force: bool = False
               ) -> Optional[str]:
    src = os.path.join(_HERE, src_name)
    lib = os.path.join(_HERE, lib_name)
    if os.path.exists(lib) and not force and \
            os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    cmd = ['g++', '-O3', '-shared', '-fPIC', src, '-o', lib]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return lib
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def build(force: bool = False) -> Optional[str]:
    a = _build_one('coco_match.cpp', 'libcocomatch.so', force)
    b = _build_one('image_prep.cpp', 'libimageprep.so', force)
    return a if b else None


def _load(key: str, src: str, libname: str, proto) -> Optional[ctypes.CDLL]:
    if key in _cached:
        return _cached[key]
    if key in _failed:
        return None
    path = _build_one(src, libname)
    if path is None:
        _failed.add(key)
        return None
    lib = ctypes.CDLL(path)
    proto(lib)
    _cached[key] = lib
    return lib


def load_cocomatch() -> Optional[ctypes.CDLL]:
    """The compiled matcher, or None (callers fall back to numpy)."""
    d = ctypes.POINTER(ctypes.c_double)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    i64 = ctypes.c_int64

    def proto(lib):
        lib.coco_match.argtypes = [d, i64, d, u8, u8, i64, d, i64, d, u8, u8]
        lib.coco_match.restype = None

    return _load('cocomatch', 'coco_match.cpp', 'libcocomatch.so', proto)


def load_imageprep() -> Optional[ctypes.CDLL]:
    """The compiled fused resize+normalize+pad, or None (cv2 fallback)."""
    f = ctypes.POINTER(ctypes.c_float)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    i64 = ctypes.c_int64

    def proto(lib):
        lib.image_prep.argtypes = [u8, i64, i64, f, i64, i64, i64, i64, f, f,
                                   ctypes.c_int]
        lib.image_prep.restype = None

    return _load('imageprep', 'image_prep.cpp', 'libimageprep.so', proto)


if __name__ == '__main__':
    out = build(force=True)
    print(out or 'build failed')
