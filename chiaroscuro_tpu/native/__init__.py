"""ctypes bindings to the native C++ components (built on demand).

``lib()`` lazily compiles ``libexr_io.so`` with the system toolchain the
first time it is needed; the build is cached next to the sources.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False


def lib() -> Optional[ctypes.CDLL]:
    """The native library, building it if necessary; None if unavailable."""
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        so = os.path.join(_DIR, "libexr_io.so")
        if not os.path.exists(so):
            try:
                subprocess.run(
                    ["sh", os.path.join(_DIR, "build.sh")],
                    check=True,
                    capture_output=True,
                )
            except Exception as e:
                print(f"WARNING: native build failed ({e}); EXR I/O degraded")
                _FAILED = True
                return None
        try:
            l = ctypes.CDLL(so)
        except OSError as e:
            print(f"WARNING: cannot load {so}: {e}")
            _FAILED = True
            return None
        l.exr_get_size.restype = ctypes.c_int
        l.exr_get_size.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        l.exr_read_rgb.restype = ctypes.c_int
        l.exr_read_rgb.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float)]
        l.exr_write_rgb.restype = ctypes.c_int
        l.exr_write_rgb.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        _LIB = l
        return _LIB


_BVH_LIB: Optional[ctypes.CDLL] = None
_BVH_FAILED = False


def bvh_lib() -> Optional[ctypes.CDLL]:
    """The native BVH builder library; None if unavailable (numpy fallback
    in ``accel/bvh.py`` takes over)."""
    global _BVH_LIB, _BVH_FAILED
    if _BVH_LIB is not None or _BVH_FAILED:
        return _BVH_LIB
    with _LOCK:
        if _BVH_LIB is not None or _BVH_FAILED:
            return _BVH_LIB
        so = os.path.join(_DIR, "libbvh.so")
        src = os.path.join(_DIR, "bvh_builder.cpp")
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            try:
                subprocess.run(
                    [
                        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                        src, "-o", so,
                    ],
                    check=True,
                    capture_output=True,
                )
            except Exception as e:
                print(f"WARNING: native BVH build failed ({e}); numpy fallback")
                _BVH_FAILED = True
                return None
        try:
            l = ctypes.CDLL(so)
        except OSError as e:
            print(f"WARNING: cannot load {so}: {e}")
            _BVH_FAILED = True
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        l.bvh_build.restype = ctypes.c_int
        l.bvh_build.argtypes = [
            f32p, f32p, f32p, ctypes.c_int, ctypes.c_int,
            f32p, f32p, i32p, i32p, i32p, i32p, i32p,
        ]
        _BVH_LIB = l
        return _BVH_LIB
