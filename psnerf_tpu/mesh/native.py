"""ctypes bindings for the native mesh library: MISE octree + isosurfacer.

Python-facing API mirrors the reference:
  MISE(res0, depth, threshold).query() / .update(points, values) / .to_dense()
    (stage1/utils/libmise/mise.pyx:34-165)
  marching_cubes(grid, iso) -> (vertices [V,3] float64 in grid coords,
                                triangles [T,3] int64)
    (stage1/utils/libmcubes/mcubes.pyx:21-26; implementation is marching
     tetrahedra — see csrc/isosurface.cpp header for the rationale)
"""

from __future__ import annotations

import ctypes

import numpy as np

from psnerf_tpu.mesh.build import build

_lib = None


def _load():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(build())
        L = _lib
        L.mise_new.restype = ctypes.c_void_p
        L.mise_new.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_double]
        L.mise_free.argtypes = [ctypes.c_void_p]
        L.mise_resolution.restype = ctypes.c_int
        L.mise_resolution.argtypes = [ctypes.c_void_p]
        L.mise_query_count.restype = ctypes.c_int64
        L.mise_query_count.argtypes = [ctypes.c_void_p]
        L.mise_query.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        L.mise_update.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64
        ]
        L.mise_to_dense.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        L.mise_to_dense_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        L.iso_run.restype = ctypes.c_void_p
        L.iso_run.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double,
        ]
        L.iso_run_f32.restype = ctypes.c_void_p
        L.iso_run_f32.argtypes = list(L.iso_run.argtypes)
        L.iso_n_verts.restype = ctypes.c_int64
        L.iso_n_verts.argtypes = [ctypes.c_void_p]
        L.iso_n_tris.restype = ctypes.c_int64
        L.iso_n_tris.argtypes = [ctypes.c_void_p]
        L.iso_copy.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        L.iso_free.argtypes = [ctypes.c_void_p]
    return _lib


class MISE:
    """Multi-resolution isosurface octree (final res = res0 * 2**depth)."""

    def __init__(self, resolution0: int, depth: int, threshold: float):
        self._lib = _load()
        self._h = self._lib.mise_new(resolution0, depth, float(threshold))
        self.resolution = self._lib.mise_resolution(self._h)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.mise_free(self._h)
            self._h = None

    def query(self) -> np.ndarray:
        n = self._lib.mise_query_count(self._h)
        out = np.empty((n, 3), dtype=np.int64)
        if n:
            self._lib.mise_query(self._h, out.ctypes.data_as(ctypes.c_void_p))
        return out

    def update(self, points: np.ndarray, values: np.ndarray) -> None:
        points = np.ascontiguousarray(points, dtype=np.int64)
        values = np.ascontiguousarray(values, dtype=np.float64)
        assert points.shape[0] == values.shape[0] and points.shape[1] == 3
        self._lib.mise_update(
            self._h,
            points.ctypes.data_as(ctypes.c_void_p),
            values.ctypes.data_as(ctypes.c_void_p),
            points.shape[0],
        )

    def to_dense(self, dtype=np.float64) -> np.ndarray:
        """dtype=np.float32 halves host memory traffic for big grids (the
        513^3 extraction path keeps the dense grid f32 end-to-end)."""
        n = self.resolution + 1
        out = np.empty((n, n, n), dtype=dtype)
        if out.dtype == np.float32:
            self._lib.mise_to_dense_f32(
                self._h, out.ctypes.data_as(ctypes.c_void_p))
        else:
            assert out.dtype == np.float64
            self._lib.mise_to_dense(
                self._h, out.ctypes.data_as(ctypes.c_void_p))
        return out


def marching_cubes(grid: np.ndarray, iso: float = 0.0):
    """Dense scalar grid -> (vertices, triangles); values > iso are inside.
    float32 grids march natively (no f64 copy)."""
    lib = _load()
    assert grid.ndim == 3
    if grid.dtype == np.float32:
        grid = np.ascontiguousarray(grid)
        run = lib.iso_run_f32
    else:
        grid = np.ascontiguousarray(grid, dtype=np.float64)
        run = lib.iso_run
    h = run(
        grid.ctypes.data_as(ctypes.c_void_p),
        grid.shape[0], grid.shape[1], grid.shape[2], float(iso),
    )
    try:
        nv = lib.iso_n_verts(h)
        nt = lib.iso_n_tris(h)
        verts = np.empty((nv, 3), dtype=np.float64)
        tris = np.empty((nt, 3), dtype=np.int64)
        if nv:
            lib.iso_copy(
                h,
                verts.ctypes.data_as(ctypes.c_void_p),
                tris.ctypes.data_as(ctypes.c_void_p),
            )
    finally:
        lib.iso_free(h)
    return verts, tris
