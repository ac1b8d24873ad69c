"""Chamfer distance between meshes (reference: chamfer_dist.py:19-41).

Bidirectional mean of exact point-to-mesh distances over area-weighted
surface samples; closest-point queries run through the native BVH
(csrc/proximity.cpp)."""

from __future__ import annotations

import ctypes

import numpy as np

from psnerf_tpu.mesh import native
from psnerf_tpu.mesh.meshio import sample_surface


class MeshProximity:
    def __init__(self, vertices: np.ndarray, faces: np.ndarray):
        lib = native._load()
        if not hasattr(lib, "_bvh_bound"):
            lib.bvh_build.restype = ctypes.c_void_p
            lib.bvh_build.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64
            ]
            lib.bvh_free.argtypes = [ctypes.c_void_p]
            lib.bvh_distances.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p
            ]
            lib._bvh_bound = True
        self._lib = lib
        v = np.ascontiguousarray(vertices, np.float64)
        t = np.ascontiguousarray(faces, np.int64)
        self._h = lib.bvh_build(
            v.ctypes.data_as(ctypes.c_void_p), len(v),
            t.ctypes.data_as(ctypes.c_void_p), len(t),
        )

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.bvh_free(self._h)
            self._h = None

    def distances(self, points: np.ndarray) -> np.ndarray:
        p = np.ascontiguousarray(points, np.float64)
        out = np.empty((len(p),), np.float64)
        self._lib.bvh_distances(
            self._h, p.ctypes.data_as(ctypes.c_void_p), len(p),
            out.ctypes.data_as(ctypes.c_void_p),
        )
        return out


def chamfer_distance(
    verts_src: np.ndarray, faces_src: np.ndarray,
    verts_tgt: np.ndarray, faces_tgt: np.ndarray,
    num_samples: int = 10_000,
    seed: int = 0,
) -> float:
    """Mean bidirectional sampled point-to-surface distance (same units as
    the meshes; the CLI multiplies by 1000 for mm)."""
    rng = np.random.default_rng(seed)
    src_pts = sample_surface(verts_src, faces_src, num_samples, rng)
    tgt_pts = sample_surface(verts_tgt, faces_tgt, num_samples, rng)
    d_st = MeshProximity(verts_tgt, faces_tgt).distances(src_pts)
    d_ts = MeshProximity(verts_src, faces_src).distances(tgt_pts)
    d_st = np.nan_to_num(d_st)
    d_ts = np.nan_to_num(d_ts)
    return float((d_st.mean() + d_ts.mean()) / 2.0)


def surface_distance(
    verts_src: np.ndarray, faces_src: np.ndarray,
    verts_tgt: np.ndarray, faces_tgt: np.ndarray,
    num_samples: int = 10_000,
    seed: int = 0,
) -> float:
    """One-directional P2S: mean distance from src surface samples to the
    target mesh (stage2/utils/metrics.py:103-113)."""
    rng = np.random.default_rng(seed)
    src_pts = sample_surface(verts_src, faces_src, num_samples, rng)
    d = MeshProximity(verts_tgt, faces_tgt).distances(src_pts)
    return float(np.nan_to_num(d).mean())
