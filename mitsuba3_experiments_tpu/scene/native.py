"""ctypes bridge to the native C++ host library (native/libm3t.so).

The reference's native tier is the whole Mitsuba/Dr.Jit C++ stack; here the
host-side native work is scene I/O and BVH building — see native/*.cpp.  The
Python fallbacks stay authoritative for correctness; the native paths are
drop-in accelerations, auto-detected at import.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (
        os.path.join(here, "..", "native", "libm3t.so"),
        os.path.join(here, "native", "libm3t.so"),
    ):
        cand = os.path.abspath(cand)
        if os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                lib.m3t_load_obj.restype = ctypes.c_int
                lib.m3t_load_obj.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_void_p),  # handle out
                    ctypes.POINTER(ctypes.c_int64),   # n_verts
                    ctypes.POINTER(ctypes.c_int64),   # n_faces
                    ctypes.POINTER(ctypes.c_int),     # has_normals
                    ctypes.POINTER(ctypes.c_int),     # has_uvs
                ]
                lib.m3t_copy_mesh.argtypes = [
                    ctypes.c_void_p,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_int32),
                ]
                lib.m3t_free_mesh.argtypes = [ctypes.c_void_p]
                _LIB = lib
                break
            except OSError:
                pass
    return _LIB


def try_load_obj_native(path: str):
    """Returns (v, n, uv, f) numpy arrays or None if native lib unavailable."""
    lib = _find_lib()
    if lib is None:
        return None
    handle = ctypes.c_void_p()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    has_n = ctypes.c_int()
    has_uv = ctypes.c_int()
    rc = lib.m3t_load_obj(
        path.encode(), ctypes.byref(handle), ctypes.byref(nv),
        ctypes.byref(nf), ctypes.byref(has_n), ctypes.byref(has_uv),
    )
    if rc != 0:
        return None
    v = np.empty((nv.value, 3), np.float32)
    n = np.empty((nv.value, 3), np.float32)
    uv = np.empty((nv.value, 2), np.float32)
    f = np.empty((nf.value, 3), np.int32)
    lib.m3t_copy_mesh(
        handle,
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        uv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    lib.m3t_free_mesh(handle)
    return (
        v,
        n if has_n.value else None,
        uv if has_uv.value else None,
        f,
    )
