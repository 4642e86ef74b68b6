"""ctypes binding for the native OBJ parser (csrc/objloader.cpp).

``load_obj_verts(path)`` mirrors the reference's tinyobjloader usage
(ppl_dynamic.py:21-35: vertices only, for dataset sanity/alignment);
``load_obj_fast(path)`` also returns triangulated faces. Builds the
shared library on first use (cached next to the source); falls back to
the pure-Python parser if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libobjloader.so"))
_SRC_PATH = os.path.abspath(os.path.join(_CSRC, "objloader.cpp"))

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC_PATH],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
                os.path.exists(_SRC_PATH)
                and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.obj_parse_file.restype = ctypes.c_void_p
        lib.obj_parse_file.argtypes = [ctypes.c_char_p]
        lib.obj_num_verts.restype = ctypes.c_int64
        lib.obj_num_verts.argtypes = [ctypes.c_void_p]
        lib.obj_num_faces.restype = ctypes.c_int64
        lib.obj_num_faces.argtypes = [ctypes.c_void_p]
        lib.obj_verts_ptr.restype = ctypes.POINTER(ctypes.c_float)
        lib.obj_verts_ptr.argtypes = [ctypes.c_void_p]
        lib.obj_faces_ptr.restype = ctypes.POINTER(ctypes.c_int64)
        lib.obj_faces_ptr.argtypes = [ctypes.c_void_p]
        lib.obj_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_obj_fast(path: str):
    """-> (verts [V, 3] float32, faces [F, 3] int64); native if possible."""
    lib = _load()
    if lib is None:  # fallback: pure python
        from .mesh import load_obj_mesh
        return load_obj_mesh(path)
    handle = lib.obj_parse_file(path.encode())
    if not handle:
        raise FileNotFoundError(path)
    try:
        nv = lib.obj_num_verts(handle)
        nf = lib.obj_num_faces(handle)
        verts = np.ctypeslib.as_array(
            lib.obj_verts_ptr(handle), shape=(nv * 3,)).reshape(nv, 3).copy()
        faces = np.ctypeslib.as_array(
            lib.obj_faces_ptr(handle), shape=(nf * 3,)).reshape(nf, 3).copy()
    finally:
        lib.obj_free(handle)
    return verts, faces


def load_obj_verts(path: str) -> np.ndarray:
    """Vertices only (tinyobjloader contract, ppl_dynamic.py:21-35)."""
    return load_obj_fast(path)[0]
