"""A/B: our marching-tetrahedra isosurfacer vs the reference's tabulated
marching cubes (stage1/utils/libmcubes/marchingcubes.{h,cpp}), compiled
standalone FROM the reference tree at test time (nothing is copied into this
repo). Both extract the same analytic grids; the bidirectional Chamfer
between the two meshes bounds the surfacing-method delta — it must sit far
below one grid cell (the evaluation noise floor of any downstream Chamfer
metric, chamfer_dist.py:19-41)."""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from psnerf_tpu.mesh.chamfer import chamfer_distance
from psnerf_tpu.mesh.native import marching_cubes

_REF_DIR = "/root/reference/stage1/utils/libmcubes"

# This A/B fixture compiles and EXECUTES C++ from the (untrusted, read-only)
# reference tree. Opt in explicitly: PSNERF_REF_AB=1 make test runs it; the
# default suite skips so plain `pytest` never builds/runs reference code.
pytestmark = pytest.mark.skipif(
    os.environ.get("PSNERF_REF_AB") != "1"
    or not os.path.exists(os.path.join(_REF_DIR, "marchingcubes.cpp")),
    reason="opt-in A/B vs the reference tree (set PSNERF_REF_AB=1; "
           "compiles+runs C++ from /root/reference)",
)

_WRAPPER = r"""
#include "marchingcubes.h"
#include <cstdint>
#include <vector>

// Dense-grid adapter mirroring the reference's own PyArrayToCFunc
// (pywrapper.cpp:79-106): lower=0, upper=n-1, num=n, f = grid[int coords].
struct GridF {
    const double* g;
    long nx, ny, nz;
    double operator()(double x, double y, double z) const {
        long i = (long)x, j = (long)y, k = (long)z;
        return g[(i * ny + j) * nz + k];
    }
};

struct McResult {
    std::vector<double> vertices;
    std::vector<size_t> polygons;
};

extern "C" {
void* mcref_run(const double* grid, long nx, long ny, long nz, double iso) {
    auto* res = new McResult();
    double lower[3] = {0, 0, 0};
    double upper[3] = {double(nx - 1), double(ny - 1), double(nz - 1)};
    GridF f{grid, nx, ny, nz};
    mc::marching_cubes<double>(lower, upper, nx, ny, nz, f, iso,
                               res->vertices, res->polygons);
    return res;
}
long mcref_n_verts(void* h) {
    return ((McResult*)h)->vertices.size() / 3;
}
long mcref_n_tris(void* h) {
    return ((McResult*)h)->polygons.size() / 3;
}
void mcref_copy(void* h, double* verts, int64_t* tris) {
    auto* res = (McResult*)h;
    for (size_t i = 0; i < res->vertices.size(); ++i)
        verts[i] = res->vertices[i];
    for (size_t i = 0; i < res->polygons.size(); ++i)
        tris[i] = (int64_t)res->polygons[i];
}
void mcref_free(void* h) { delete (McResult*)h; }
}
"""


@pytest.fixture(scope="module")
def ref_mc(tmp_path_factory):
    d = tmp_path_factory.mktemp("mcref")
    src = d / "wrapper.cpp"
    src.write_text(_WRAPPER)
    so = d / "libmcref.so"
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", f"-I{_REF_DIR}", str(src),
         os.path.join(_REF_DIR, "marchingcubes.cpp"), "-o", str(so)],
        check=True,
    )
    lib = ctypes.CDLL(str(so))
    lib.mcref_run.restype = ctypes.c_void_p
    lib.mcref_run.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
                              ctypes.c_long, ctypes.c_double]
    lib.mcref_n_verts.argtypes = [ctypes.c_void_p]
    lib.mcref_n_verts.restype = ctypes.c_long
    lib.mcref_n_tris.argtypes = [ctypes.c_void_p]
    lib.mcref_n_tris.restype = ctypes.c_long
    lib.mcref_copy.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_void_p]
    lib.mcref_free.argtypes = [ctypes.c_void_p]

    def run(grid, iso=0.0):
        grid = np.ascontiguousarray(grid, np.float64)
        h = lib.mcref_run(grid.ctypes.data_as(ctypes.c_void_p),
                          *grid.shape, float(iso))
        try:
            nv, nt = lib.mcref_n_verts(h), lib.mcref_n_tris(h)
            verts = np.empty((nv, 3), np.float64)
            tris = np.empty((nt, 3), np.int64)
            if nv:
                lib.mcref_copy(h, verts.ctypes.data_as(ctypes.c_void_p),
                               tris.ctypes.data_as(ctypes.c_void_p))
        finally:
            lib.mcref_free(h)
        # the reference evaluates/emits at index+0.5 (dx/2 offsets with
        # dx=1, marchingcubes.h:43-56) — shift back to index coordinates
        return verts - 0.5, tris

    return run


def _grids(n=64):
    idx = np.arange(n, dtype=np.float64)
    x, y, z = np.meshgrid(idx, idx, idx, indexing="ij")
    c = (n - 1) / 2.0
    sphere = 0.35 * n - np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
    # non-convex union of two blobs + a torus-ish ridge: exercises many
    # cube/tet case topologies
    b1 = 0.22 * n - np.sqrt((x - 0.35 * n) ** 2 + (y - 0.40 * n) ** 2
                            + (z - 0.5 * n) ** 2)
    b2 = 0.18 * n - np.sqrt((x - 0.62 * n) ** 2 + (y - 0.58 * n) ** 2
                            + (z - 0.5 * n) ** 2)
    rr = np.sqrt((x - c) ** 2 + (y - c) ** 2)
    torus = 0.08 * n - np.sqrt((rr - 0.3 * n) ** 2 + (z - 0.25 * n) ** 2)
    blobs = np.maximum(np.maximum(b1, b2), torus)
    return {"sphere": sphere, "blobs": blobs}


def test_marching_tets_vs_reference_mc(ref_mc):
    """Chamfer between our MT extraction and the reference MC extraction of
    identical grids must be well under one grid cell."""
    for name, grid in _grids().items():
        v_mt, t_mt = marching_cubes(grid, 0.0)          # inside = v > iso
        v_mc, t_mc = ref_mc(-grid, 0.0)                 # inside = v <= iso
        assert len(v_mt) and len(v_mc), name
        d = chamfer_distance(v_mt, t_mt, v_mc, t_mc, num_samples=10_000)
        # one grid cell = 1.0; both methods linearly interpolate the same
        # field, so the delta is sub-cell by a wide margin
        print(f"[mesh A/B] {name}: chamfer = {d:.4f} cells "
              f"({len(v_mt)} MT verts vs {len(v_mc)} MC verts)")
        assert d < 0.2, f"{name}: chamfer {d:.3f} cells vs reference MC"


def test_marching_tets_vs_reference_mc_sphere_radius(ref_mc):
    """Both meshes must agree with the ANALYTIC sphere, not just each other
    (rules out a shared bias)."""
    n = 64
    grid = _grids(n)["sphere"]
    c = (n - 1) / 2.0
    for verts, _ in (marching_cubes(grid, 0.0), ref_mc(-grid, 0.0)):
        r = np.linalg.norm(verts - c, axis=1)
        assert abs(r.mean() - 0.35 * n) < 0.1
        assert r.std() < 0.15
