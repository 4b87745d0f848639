"""Bandwidth-minimizing vertex reorderings — the build-time step that gives
ARBITRARY meshes the band structure the fast solvers exploit.

The reference's planners run on any scanned triangle mesh
(dijkstra_mesh_planner.cpp:217-398 iterates a PMPMesh priority queue — vertex
numbering is irrelevant to a heap). The TPU solvers instead relax by
*constant-offset shifts* (ops/structured.py, ops/pallas_banded.py), so vertex
numbering IS the data layout: the banded kernel wants row-major numbering
where almost every edge connects (r, c) to (r + dr, c + dc), |dr| <= 1,
|dc| <= 1.

Two orderings are provided:

- `band_order`: spatial row binning — sort by one planar axis into rows of a
  fixed width n, sort within each row by the other axis. On scanned-terrain
  style meshes (near-uniform sampling density) this recovers ~97% 8-class
  coverage even for jittered-Delaunay topology (measured: 0.974 at 262k,
  degrees 3..20); leftovers ride the solvers' residual scatter path.
- `rcm_order`: reverse Cuthill-McKee over the vertex graph (scipy) — the
  classic bandwidth minimizer, better for meshes without a usable planar
  parametrization (closed surfaces, caves). Feeds the structured top-K-offset
  solver rather than the fixed-width banded kernel.

Use `reorder_mesh(vertices, faces)` before `build_mesh`; it relabels the raw
arrays and returns the chosen row width, which `build_mesh`-adjacent code
registers as the `band_hint` host table so plan builders pick it up.
"""

from __future__ import annotations

import numpy as np


def band_order(
    vertices: np.ndarray,
    *,
    n_cols: int = 0,
    col_axis: int = -1,
) -> tuple[np.ndarray, int]:
    """Spatial row-binning permutation.

    Returns (perm, n_cols) where perm lists old vertex ids in the new order
    (new id i ↔ old id perm[i]). Rows bin along the non-column axis; columns
    sort along `col_axis` (auto: the planar axis with the larger extent, so
    a W×H sampled area gets n ≈ sqrt(V·W/H) — exactly the grid's row width
    when the input IS a grid)."""
    v = np.asarray(vertices, np.float64)
    V = len(v)
    ext = v.max(axis=0) - v.min(axis=0)
    if col_axis < 0:
        # planar axes = the two largest extents; column axis = larger
        planar = np.argsort(ext)[-2:]
        col_axis = int(planar[np.argmax(ext[planar])])
        row_axis = int(planar[np.argmin(ext[planar])])
    else:
        rest = [a for a in range(3) if a != col_axis]
        row_axis = int(rest[int(np.argmax(ext[rest]))])
    if n_cols <= 0:
        w = max(ext[col_axis], 1e-9)
        h = max(ext[row_axis], 1e-9)
        n_cols = max(8, int(round(np.sqrt(V * w / h))))
    # rows of exactly n_cols vertices by row-axis rank, x-sorted within
    by_row = np.argsort(v[:, row_axis], kind="stable")
    row_of = np.empty(V, np.int64)
    row_of[by_row] = np.arange(V) // n_cols
    perm = np.lexsort((v[:, col_axis], row_of))
    return perm, int(n_cols)


def rcm_order(edges: np.ndarray, num_vertices: int) -> np.ndarray:
    """Reverse Cuthill-McKee permutation over the undirected edge list —
    returns old ids in new order (same convention as band_order)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    e = np.asarray(edges, np.int64)
    data = np.ones(2 * len(e), np.int8)
    rows = np.concatenate([e[:, 0], e[:, 1]])
    cols = np.concatenate([e[:, 1], e[:, 0]])
    g = coo_matrix((data, (rows, cols)), shape=(num_vertices, num_vertices)).tocsr()
    return np.asarray(reverse_cuthill_mckee(g, symmetric_mode=True), np.int64)


def apply_order(
    vertices: np.ndarray, faces: np.ndarray, perm: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Relabel (vertices, faces) by a permutation (old ids in new order)."""
    V = len(vertices)
    inv = np.empty(V, np.int64)
    inv[perm] = np.arange(V)
    return np.ascontiguousarray(vertices[perm]), inv[
        np.asarray(faces, np.int64)
    ].astype(np.int32)


def reorder_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    *,
    method: str = "band",
    n_cols: int = 0,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Relabel a raw mesh for solver-friendly numbering.

    Returns (vertices, faces, band_hint); band_hint is the fixed row width
    for the banded kernel (0 for rcm — use the structured solver there).
    Callers pass band_hint to build_mesh via
    `register_host_arrays(mesh, {"band_hint": np.int64(n)})` or use
    mesh.io/build helpers that do it for them."""
    if method == "band":
        perm, n = band_order(vertices, n_cols=n_cols)
        v2, f2 = apply_order(vertices, faces, perm)
        return v2, f2, n
    if method == "rcm":
        raw = np.sort(
            np.concatenate(
                [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
            ),
            axis=1,
        )
        edges = np.unique(raw, axis=0)
        perm = rcm_order(edges, len(vertices))
        v2, f2 = apply_order(vertices, faces, perm)
        return v2, f2, 0
    raise ValueError(f"unknown reorder method: {method}")


def build_reordered_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    *,
    method: str = "band",
    n_cols: int = 0,
    **build_kwargs,
):
    """reorder_mesh + build_mesh + band_hint registration in one call — the
    import-path entry point for arbitrary meshes (PLY/OBJ/DAE loads feed
    through here when reorder=True)."""
    from mesh_navigation_tpu.mesh.arrays import build_mesh, register_host_arrays

    v2, f2, hint = reorder_mesh(vertices, faces, method=method, n_cols=n_cols)
    mesh = build_mesh(v2, f2, **build_kwargs)
    if hint:
        register_host_arrays(mesh, {"band_hint": np.int64(hint)})
    return mesh
