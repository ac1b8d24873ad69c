"""Build the native mesh library (g++ -> libpsmesh.so), cached by mtime.

pybind11 is not available in this image; the C API is consumed via ctypes
(psnerf_tpu/mesh/native.py).
"""

from __future__ import annotations

import os
import subprocess

_CSRC = os.path.join(os.path.dirname(__file__), "csrc")
_SOURCES = ["mise.cpp", "isosurface.cpp", "proximity.cpp"]
_LIB = os.path.join(_CSRC, "libpsmesh.so")


def build(force: bool = False) -> str:
    srcs = [os.path.join(_CSRC, s) for s in _SOURCES]
    if not force and os.path.exists(_LIB):
        lib_mtime = os.path.getmtime(_LIB)
        if all(os.path.getmtime(s) <= lib_mtime for s in srcs):
            return _LIB
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        *srcs, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True)
    return _LIB
