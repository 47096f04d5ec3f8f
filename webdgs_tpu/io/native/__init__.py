"""ctypes bindings for the native COLMAP parsers, compiled on demand with
g++ and cached next to the source.  Falls back to None if no compiler is
available — the pure-Python parsers in io/ply.py and io/colmap.py remain
the reference implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "fastcolmap.cpp")
_LIB = os.path.join(_DIR, "libfastcolmap.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        src_mtime = os.path.getmtime(_SRC)
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < src_mtime):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def get_lib():
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        if _build():
            lib = ctypes.CDLL(_LIB)
            lib.parse_points3d.restype = ctypes.c_int64
            lib.parse_points3d.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
            lib.parse_images_bin.restype = ctypes.c_int64
            lib.parse_images_bin.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
            _lib = lib
    return _lib


def parse_points3d(data: bytes):
    """Returns (xyz (n,3) f32, rgb (n,3) f32) or None if unavailable."""
    lib = get_lib()
    if lib is None or len(data) < 8:
        return None
    n = int.from_bytes(data[:8], "little")
    xyz = np.empty((n, 3), np.float32)
    rgb = np.empty((n, 3), np.float32)
    got = lib.parse_points3d(
        data, len(data),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    if got < 0:
        return None
    return xyz[:got], rgb[:got]


def parse_images_bin(data: bytes):
    """Returns (ids, qvecs (n,4), tvecs (n,3), camera_ids, names) or None."""
    lib = get_lib()
    if lib is None or len(data) < 8:
        return None
    n = int.from_bytes(data[:8], "little")
    ids = np.empty(n, np.int32)
    qvecs = np.empty((n, 4), np.float64)
    tvecs = np.empty((n, 3), np.float64)
    cam_ids = np.empty(n, np.int32)
    name_buf = ctypes.create_string_buffer(len(data) + n + 16)
    offsets = np.empty(n, np.int64)
    got = lib.parse_images_bin(
        data, len(data),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        qvecs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        tvecs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cam_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        name_buf, len(name_buf),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n)
    if got < 0:
        return None
    raw = name_buf.raw
    names = []
    for i in range(got):
        end = raw.index(b"\x00", offsets[i])
        names.append(raw[offsets[i]:end].decode("utf-8", errors="replace"))
    return ids[:got], qvecs[:got], tvecs[:got], cam_ids[:got], names
