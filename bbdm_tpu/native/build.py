"""Build/load the fastimage C++ extension (ctypes, no pybind11)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = None
_tried = False


def _source_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "fastimage.cpp")


def _cache_dir() -> str:
    d = os.environ.get("BBDM_NATIVE_CACHE",
                       os.path.join(os.path.expanduser("~"), ".cache", "bbdm_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> str | None:
    src = _source_path()
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_cache_dir(), f"fastimage-{digest}.so")
    if os.path.exists(out):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           src, "-o", out + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(out + ".tmp", out)
        return out
    except (subprocess.SubprocessError, OSError, FileNotFoundError):
        return None


def get_fastimage():
    """The loaded ctypes library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.preprocess_image.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.preprocess_image.restype = None
        _lib = lib
        return _lib


def fastimage_available() -> bool:
    return get_fastimage() is not None
