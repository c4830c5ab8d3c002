"""Native runtime: C++ threaded batch prefetcher (built on demand with g++).

``load_library()`` compiles ``prefetch.cpp`` into a cached shared object and returns a
ctypes handle (None when no toolchain is available — callers fall back to the Python
loader)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libprefetch.so")
_SRC = os.path.join(_HERE, "prefetch.cpp")

_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile the shared library if needed; returns success."""
    if os.path.exists(_SO_PATH) and not force:
        if os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC):
            return True
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-pthread", _SRC, "-o", _SO_PATH],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", b"") or b""
        print(f"[sml_tpu.runtime] native build failed: {msg.decode()[:500]}")
        return False


def load_library():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not build():
            return None
        lib = ctypes.CDLL(_SO_PATH)
        lib.pf_open.restype = ctypes.c_void_p
        lib.pf_open.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                                ctypes.c_int64, ctypes.c_int64]
        lib.pf_submit.restype = ctypes.c_int64
        lib.pf_submit.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
        lib.pf_next.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.pf_next.argtypes = [ctypes.c_void_p]
        lib.pf_close.restype = None
        lib.pf_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None
