"""Build + ctypes bindings for the native C++ helpers in native/.

The shared library is compiled on first use with g++ (-O3) into
``native/build/`` and cached; every entry point has a NumPy fallback, so the
framework works (slower) without a toolchain.  No pybind11 -- plain C ABI +
ctypes, per the environment constraints.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRCS = [os.path.join(_ROOT, "native", f)
         for f in ("raycast.cpp", "frameio.cpp")]
_BUILD_DIR = os.path.join(_ROOT, "native", "build")
_LIB = os.path.join(_BUILD_DIR, "libtpuao_native.so")

_lock = threading.Lock()
_lib = None
_tried = False

ABI_VERSION = 3  # v3: 3-channel 'PF' codec (fio_*2 entry points)


def _build() -> str | None:
    srcs = [s for s in _SRCS if os.path.exists(s)]
    if not srcs:
        return None
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if (os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= max(map(os.path.getmtime, srcs))):
        return _LIB
    # Build to a per-pid temp path and os.rename into place: two processes
    # compiling concurrently (bench + pytest, say) must not interleave
    # writes into the final .so -- a corrupt library with a fresh mtime
    # would defeat the rebuild check for every later process.
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", tmp]
            + srcs,
            check=True, capture_output=True, timeout=120)
        os.rename(tmp, _LIB)  # atomic on POSIX
        return _LIB
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def get_lib():
    """The loaded native library, or None (NumPy fallback)."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            # AttributeError covers a loadable .so missing our symbols
            # (stale/foreign library) -- fall back, don't crash
            if lib.tpuao_native_abi_version() != ABI_VERSION:
                return None
            lib.raycast_spheres.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
                ctypes.c_double, ctypes.c_double, ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.raycast_spheres.restype = None
            _lib = lib
        except (OSError, AttributeError):
            _lib = None
        return _lib


def raycast_spheres_native(h, w, tan_h, tan_v, far, plane_y, centers, radii,
                           with_normals):
    """Native ray-cast; returns (depth[, normals]) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    centers = np.ascontiguousarray(centers, dtype=np.float64)
    radii = np.ascontiguousarray(radii, dtype=np.float64)
    depth = np.empty((h, w), dtype=np.float64)
    normals = np.empty((h, w, 3), dtype=np.float64) if with_normals else None
    dptr = depth.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    nptr = (normals.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
            if with_normals else
            ctypes.cast(None, ctypes.POINTER(ctypes.c_double)))
    cptr = centers.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    rptr = radii.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    lib.raycast_spheres(h, w, tan_h, tan_v, far, plane_y, len(radii),
                        cptr, rptr, dptr, nptr)
    return (depth, normals) if with_normals else depth
