"""Native host-runtime bindings (C++ via ctypes, built on first use).

The compute path is JAX/XLA/Pallas; this module covers the *host* runtime
the reference implements in C++ (scene packing, BTF database parsing, LBS
skinning — SURVEY.md sections 2.2/2.4). Every entry point has a numpy
fallback so the framework still works if no compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "rtf_native.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "librtf_native.so")

_lib = None
_tried = False


def _f32(a):
    return np.ascontiguousarray(a, np.float32)


def _i32(a):
    return np.ascontiguousarray(a, np.int32)


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def build(force: bool = False) -> str | None:
    """Compile the shared library (cached). Returns the path or None."""
    if os.path.exists(_LIB_PATH) and not force:
        if os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
            return _LIB_PATH
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-march=native",
        _SRC, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def get_lib():
    """Load (building if needed); returns None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.rtf_parse_doubles.restype = ctypes.c_longlong
    lib.rtf_parse_doubles.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_longlong,
    ]
    lib.rtf_parse_header.restype = ctypes.c_int
    lib.rtf_parse_header.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_longlong),
    ]
    lib.rtf_pack_corners.restype = None
    lib.rtf_pack_corners.argtypes = [ctypes.c_void_p] * 7 + [
        ctypes.c_int64, ctypes.c_void_p,
    ] + [ctypes.c_void_p] * 8
    lib.rtf_compute_vertex_normals.restype = None
    lib.rtf_compute_vertex_normals.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p,
    ]
    lib.rtf_skin_vertices.restype = None
    lib.rtf_skin_vertices.argtypes = [ctypes.c_void_p] * 6 + [
        ctypes.c_int64,
    ] + [ctypes.c_void_p] * 3
    _lib = lib
    return _lib


def parse_numeric_file(path: str, dtype=np.float32):
    """Fast parse of a BTF array file: returns (rows, cols, flat values).

    Ref ParseFloatData/ParseIntData (CompressedBTF.cpp:7-56).
    """
    lib = get_lib()
    if lib is None:
        with open(path) as f:
            tokens = f.read().split()
        rows, cols = int(tokens[0]), int(tokens[1])
        return rows, cols, np.asarray(tokens[4 : 4 + rows * cols], dtype=dtype)

    rows = ctypes.c_longlong()
    cols = ctypes.c_longlong()
    if lib.rtf_parse_header(path.encode(), ctypes.byref(rows), ctypes.byref(cols)):
        raise IOError(f"cannot read header of {path}")
    n = rows.value * cols.value
    buf = np.empty(n + 4, np.float64)
    got = lib.rtf_parse_doubles(path.encode(), _ptr(buf), n + 4)
    if got < n + 4:
        raise IOError(f"{path}: expected {n + 4} values, parsed {got}")
    values = buf[4 : 4 + n]
    if np.issubdtype(np.dtype(dtype), np.integer):
        values = np.rint(values).astype(dtype)
    else:
        values = values.astype(dtype)
    return rows.value, cols.value, values


def pack_corners(mesh_arrays: dict, tris: np.ndarray, transform: np.ndarray):
    """Fused per-corner bake; returns dict of SoA buffers or None if the
    native library is unavailable (caller falls back to numpy)."""
    lib = get_lib()
    if lib is None:
        return None
    tris = _i32(tris)
    t = tris.shape[0]
    out = {
        "v0": np.empty((t, 3), np.float32),
        "e1": np.empty((t, 3), np.float32),
        "e2": np.empty((t, 3), np.float32),
        "normal": np.empty((t, 3, 3), np.float32),
        "tangent": np.empty((t, 3, 3), np.float32),
        "tex_coord": np.empty((t, 3, 2), np.float32),
        "color": np.empty((t, 3, 4), np.float32),
        "data": np.empty((t, 3, 4), np.float32),
    }
    # keep temporaries alive across the call
    keep = [_f32(mesh_arrays[k]) for k in (
        "positions", "normals", "tangents", "colors", "tex_coords", "data",
    )]
    tm = _f32(transform)
    lib.rtf_pack_corners(
        _ptr(keep[0]), _ptr(keep[1]), _ptr(keep[2]), _ptr(keep[3]),
        _ptr(keep[4]), _ptr(keep[5]), _ptr(tris), ctypes.c_int64(t),
        _ptr(tm),
        *(_ptr(out[k]) for k in (
            "v0", "e1", "e2", "normal", "tangent", "tex_coord", "color",
            "data",
        )),
    )
    return out


def compute_vertex_normals(positions: np.ndarray, tris: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    positions = _f32(positions)
    tris = _i32(tris)
    out = np.empty_like(positions)
    lib.rtf_compute_vertex_normals(
        _ptr(positions), ctypes.c_int64(positions.shape[0]),
        _ptr(tris), ctypes.c_int64(tris.shape[0]), _ptr(out),
    )
    return out


def skin_vertices(positions, normals, tangents, bone_ids, bone_weights,
                  bone_matrices):
    lib = get_lib()
    if lib is None:
        return None
    positions = _f32(positions)
    normals = _f32(normals)
    tangents = _f32(tangents)
    bone_ids = _i32(bone_ids)
    bone_weights = _f32(bone_weights)
    bone_matrices = _f32(bone_matrices)
    n = positions.shape[0]
    out_p = np.empty_like(positions)
    out_n = np.empty_like(normals)
    out_t = np.empty_like(tangents)
    lib.rtf_skin_vertices(
        _ptr(positions), _ptr(normals), _ptr(tangents), _ptr(bone_ids),
        _ptr(bone_weights), _ptr(bone_matrices), ctypes.c_int64(n),
        _ptr(out_p), _ptr(out_n), _ptr(out_t),
    )
    return out_p, out_n, out_t
