"""ctypes bindings for the native IO library (auto-builds on first use).

`load()` returns the library handle or None (pure-Python fallbacks in
fovsplat.data.colmap are used then).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libfastio.so")
_lib = None
_tried = False


def load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["sh", os.path.join(_DIR, "build.sh")],
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.parse_points3d.restype = ctypes.c_int64
    lib.count_points3d.restype = ctypes.c_int64
    lib.parse_images.restype = ctypes.c_int64
    _lib = lib
    return _lib


def parse_points3d(path: str):
    """Fast points3D.bin parse. Returns (xyz, rgb, err) or None."""
    lib = load()
    if lib is None:
        return None
    buf = np.fromfile(path, dtype=np.uint8)
    n = lib.count_points3d(buf.ctypes.data_as(ctypes.c_void_p),
                           ctypes.c_int64(buf.size))
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty(n, np.float64)
    got = lib.parse_points3d(
        buf.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(buf.size),
        xyz.ctypes.data_as(ctypes.c_void_p),
        rgb.ctypes.data_as(ctypes.c_void_p),
        err.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(n))
    if got != n:
        return None
    return xyz, rgb, err


def parse_images(path: str):
    """Fast images.bin parse. Returns (ids, qvecs, tvecs, cam_ids, names)
    or None."""
    lib = load()
    if lib is None:
        return None
    buf = np.fromfile(path, dtype=np.uint8)
    if buf.size < 8:
        return None
    n = int(np.frombuffer(buf[:8].tobytes(), np.uint64)[0])
    ids = np.empty(n, np.int32)
    qvecs = np.empty((n, 4), np.float64)
    tvecs = np.empty((n, 3), np.float64)
    cam_ids = np.empty(n, np.int32)
    names_cap = 512 * max(n, 1)
    names = ctypes.create_string_buffer(names_cap)
    got = lib.parse_images(
        buf.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(buf.size),
        ids.ctypes.data_as(ctypes.c_void_p),
        qvecs.ctypes.data_as(ctypes.c_void_p),
        tvecs.ctypes.data_as(ctypes.c_void_p),
        cam_ids.ctypes.data_as(ctypes.c_void_p),
        names, ctypes.c_int64(names_cap), ctypes.c_int64(n))
    if got != n:
        return None
    raw = names.raw
    out_names = []
    pos = 0
    for _ in range(n):
        endp = raw.index(b"\x00", pos)
        out_names.append(raw[pos:endp].decode())
        pos = endp + 1
    return ids, qvecs, tvecs, cam_ids, out_names
