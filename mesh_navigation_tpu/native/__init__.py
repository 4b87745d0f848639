"""ctypes bindings for the native host core (meshcore.cpp).

Compiled on demand with g++ (cached next to the source); falls back cleanly
so pure-Python paths keep working when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "meshcore.cpp")
_SO = os.path.join(_DIR, "libmeshcore.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=300,
        )
        return True
    except Exception as e:  # pragma: no cover
        print(f"meshcore: native build failed ({e}); using Python fallback", file=sys.stderr)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _compile():
            return None
    lib = ctypes.CDLL(_SO)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    c = ctypes.c_int32
    lib.meshcore_build.restype = ctypes.c_void_p
    lib.meshcore_build.argtypes = [c, c, f32p, i32p]
    lib.meshcore_free.argtypes = [ctypes.c_void_p]
    for name in ("num_faces", "num_edges", "max_degree", "max_vertex_faces"):
        fn = getattr(lib, f"meshcore_{name}")
        fn.restype = c
        fn.argtypes = [ctypes.c_void_p]
    lib.meshcore_fill.restype = None
    lib.meshcore_fill.argtypes = [
        ctypes.c_void_p, i32p, i32p, f32p, i32p,
        c, i32p, i32p, u8p, c, i32p, i32p, u8p, u8p, u8p,
    ]
    lib.meshcore_radius_neighborhood.restype = c
    lib.meshcore_radius_neighborhood.argtypes = [
        ctypes.c_void_p, ctypes.c_float, c, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.meshcore_dijkstra.restype = None
    lib.meshcore_dijkstra.argtypes = [
        ctypes.c_void_p, f32p, f32p, ctypes.c_float, c, f32p, i32p,
    ]
    lib.meshcore_cvp.restype = None
    lib.meshcore_cvp.argtypes = [
        ctypes.c_void_p, f32p, f32p, ctypes.c_float, i32p, f32p, c,
        f32p, i32p, f32p,
    ]
    _lib = lib
    return _lib


class NativeMesh:
    """RAII wrapper over the meshcore handle."""

    def __init__(self, vertices: np.ndarray, faces: np.ndarray):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native meshcore unavailable")
        self._lib = lib
        self.vertices = np.ascontiguousarray(vertices, np.float32)
        faces = np.ascontiguousarray(faces, np.int32)
        self.V = len(self.vertices)
        self._h = lib.meshcore_build(self.V, len(faces), self.vertices, faces)
        self.F = lib.meshcore_num_faces(self._h)
        self.E = lib.meshcore_num_edges(self._h)
        self.max_degree = max(1, lib.meshcore_max_degree(self._h))
        self.max_vertex_faces = max(1, lib.meshcore_max_vertex_faces(self._h))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.meshcore_free(self._h)
            self._h = None

    def tables(self):
        V, F, E = self.V, self.F, self.E
        D, FD = self.max_degree, self.max_vertex_faces
        out = dict(
            faces=np.zeros((F, 3), np.int32),
            edges=np.zeros((E, 2), np.int32),
            edge_dist=np.zeros(E, np.float32),
            face_edges=np.zeros((F, 3), np.int32),
            adj_vertex=np.zeros((V, D), np.int32),
            adj_edge=np.zeros((V, D), np.int32),
            adj_mask=np.zeros((V, D), np.uint8),
            vf_face=np.zeros((V, FD), np.int32),
            vf_corner=np.zeros((V, FD), np.int32),
            vf_mask=np.zeros((V, FD), np.uint8),
            boundary=np.zeros(V, np.uint8),
            invalid=np.zeros(V, np.uint8),
        )
        self._lib.meshcore_fill(
            self._h, out["faces"], out["edges"], out["edge_dist"],
            out["face_edges"], D, out["adj_vertex"], out["adj_edge"],
            out["adj_mask"], FD, out["vf_face"], out["vf_corner"],
            out["vf_mask"], out["boundary"], out["invalid"],
        )
        return out

    def radius_neighborhood(self, radius: float) -> tuple[np.ndarray, np.ndarray]:
        K = self._lib.meshcore_radius_neighborhood(self._h, radius, 0, None, None)
        neigh = np.zeros((self.V, K), np.int32)
        mask = np.zeros((self.V, K), np.uint8)
        self._lib.meshcore_radius_neighborhood(
            self._h, radius, K,
            neigh.ctypes.data_as(ctypes.c_void_p),
            mask.ctypes.data_as(ctypes.c_void_p),
        )
        return neigh, mask.astype(bool)

    def dijkstra(
        self,
        edge_weights: np.ndarray,
        vertex_costs: np.ndarray,
        seed: int,
        cost_limit: float = 1.0,
    ) -> tuple[np.ndarray, np.ndarray]:
        dist = np.zeros(self.V, np.float32)
        pred = np.zeros(self.V, np.int32)
        self._lib.meshcore_dijkstra(
            self._h,
            np.ascontiguousarray(edge_weights, np.float32),
            np.ascontiguousarray(vertex_costs, np.float32),
            float(cost_limit), int(seed), dist, pred,
        )
        return dist, pred


    def cvp(
        self,
        side_weights: np.ndarray,
        vertex_costs: np.ndarray,
        seeds: np.ndarray,
        seed_dists: np.ndarray,
        cost_limit: float = 1.0,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Native CVP fast-marching oracle (cvp_mesh_planner.cpp:651-886) —
        same contract as utils/oracle.cvp_oracle. Returns (dist, pred, theta)."""
        seeds = np.ascontiguousarray(seeds, np.int32)
        dist = np.zeros(self.V, np.float32)
        pred = np.zeros(self.V, np.int32)
        theta = np.zeros(self.V, np.float32)
        self._lib.meshcore_cvp(
            self._h,
            np.ascontiguousarray(side_weights, np.float32),
            np.ascontiguousarray(vertex_costs, np.float32),
            float(cost_limit), seeds,
            np.ascontiguousarray(seed_dists, np.float32), len(seeds),
            dist, pred, theta,
        )
        return dist, pred, theta


def available() -> bool:
    return get_lib() is not None
