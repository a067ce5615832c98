"""ctypes bridge to the native LineMOD index parser (native/linemod_index.cpp).

Compiles on demand with g++ (cached by source mtime) and falls back to
PyYAML transparently when the toolchain or the .so is unavailable — the
index contents are identical either way (tested in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "native", "linemod_index.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "liblinemod_index.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_SRC):
            _lib_failed = True
            return None
        stale = not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        if stale and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _lib_failed = True
            return None
        lib.parse_gt_yml.restype = ctypes.c_long
        lib.parse_gt_yml.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_double))]
        lib.parse_info_yml.restype = ctypes.c_long
        lib.parse_info_yml.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_double))]
        lib.linemod_free.restype = None
        lib.linemod_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        _lib = lib
        return _lib


def _call(fn, path: str, row_len: int) -> Optional[np.ndarray]:
    ptr = ctypes.POINTER(ctypes.c_double)()
    n = fn(path.encode(), ctypes.byref(ptr))
    if n < 0:
        return None
    try:
        flat = np.ctypeslib.as_array(ptr, shape=(int(n) * row_len,))
        return flat.reshape(int(n), row_len).copy()
    finally:
        lib = get_lib()
        if lib is not None:
            lib.linemod_free(ptr)


def parse_gt(path: str) -> Optional[Dict[int, List[dict]]]:
    """gt.yml -> {frame_id: [{'obj_id', 'obj_bb', 'cam_R_m2c', 'cam_t_m2c'}]}
    with the same value shapes yaml.safe_load produces; None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    rows = _call(lib.parse_gt_yml, path, 18)
    if rows is None:
        return None
    out: Dict[int, List[dict]] = {}
    for row in rows:
        out.setdefault(int(row[0]), []).append(
            {
                "obj_id": int(row[1]),
                "obj_bb": row[2:6].tolist(),
                "cam_R_m2c": row[6:15].tolist(),
                "cam_t_m2c": row[15:18].tolist(),
            }
        )
    return out


def parse_info(path: str) -> Optional[Dict[int, dict]]:
    """info.yml -> {frame_id: {'cam_K', 'depth_scale'}}; None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    rows = _call(lib.parse_info_yml, path, 11)
    if rows is None:
        return None
    return {
        int(row[0]): {"cam_K": row[1:10].tolist(), "depth_scale": float(row[10])}
        for row in rows
    }
