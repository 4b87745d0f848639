"""Static CSR mesh bundle — the TPU-native replacement for the half-edge mesh.

The reference stack keeps its mesh in an `lvr2::PMPMesh` half-edge structure
with handle-based incidence queries (reference: mesh_map/include/mesh_map/
mesh_map.h:66,276-279) and typed attribute maps. On TPU we want static shapes,
int32 indices, and regular padded adjacency so every incidence query becomes a
gather. `MeshArrays` is an immutable pytree of device arrays built once on the
host (numpy) and then used by every kernel.

Padding convention: adjacency rows are padded to the max degree with the
vertex's own index (for vertex tables) or 0 (for face tables) plus an explicit
mask; gathers of padded slots are therefore always in-bounds and masked out
arithmetically (no dynamic shapes anywhere).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

INVALID = np.int32(-1)

# ---------------------------------------------------------------------------
# Host mirrors. Plan/grid builders need numpy views of the mesh tables, but
# device->host reads over a tunneled TPU backend are catastrophically slow
# (measured 0.2 MB/s on axon vs 110 MB/s host->device). Since every mesh is
# built on the host anyway, build_mesh registers its numpy arrays here and
# `host_array()` serves them back without touching the device. Fallback pulls
# (for meshes not built through build_mesh) are cached so each field is
# transferred at most once.
# ---------------------------------------------------------------------------
# key -> (anchor, tables). The anchor is the mesh's vertices array itself:
# keying by id() alone is unsound (Python reuses ids after GC, so a new mesh
# could silently read another mesh's cached tables — observed as a wrong
# banded plan when two meshes were built in one test session); holding a
# reference pins the id for the lifetime of the cache entry.
_HOST_TABLES: dict[int, tuple[object, dict[str, np.ndarray]]] = {}


def _mesh_key(mesh: "MeshArrays") -> int:
    return id(mesh.vertices)


def _mesh_cache(mesh: "MeshArrays") -> dict:
    key = _mesh_key(mesh)
    entry = _HOST_TABLES.get(key)
    if entry is None or entry[0] is not mesh.vertices:
        entry = (mesh.vertices, {})
        _HOST_TABLES[key] = entry
    return entry[1]


def register_host_arrays(mesh: "MeshArrays", arrays: dict[str, np.ndarray]) -> None:
    _mesh_cache(mesh).update(arrays)


def host_array_opt(mesh: "MeshArrays", name: str):
    """Registered host-side metadata (e.g. `band_hint` from reorder_mesh) —
    returns None when absent instead of pulling from the device."""
    return _mesh_cache(mesh).get(name)


def host_array(mesh: "MeshArrays", name: str) -> np.ndarray:
    """Numpy mirror of a MeshArrays field, avoiding device->host transfers
    whenever the mesh was built on the host (always true for build_mesh/io)."""
    cache = _mesh_cache(mesh)
    if name not in cache:
        cache[name] = np.asarray(getattr(mesh, name))
    return cache[name]


def _pad_rows(rows: list[np.ndarray], pad_value: int, min_width: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Pad a ragged list of int arrays into a dense [N, D] matrix + mask."""
    width = max(min_width, max((len(r) for r in rows), default=1))
    out = np.full((len(rows), width), pad_value, dtype=np.int32)
    mask = np.zeros((len(rows), width), dtype=bool)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
        mask[i, : len(r)] = True
    return out, mask


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MeshArrays:
    """Immutable CSR bundle describing a triangle mesh and its adjacency.

    Replaces `lvr2::PMPMesh` incidence queries (getEdgesOfVertex,
    getVerticesOfEdge, getFacesOfVertex, getVerticesOfFace, getEdgeBetween —
    reference: SURVEY.md §2.2) with padded gather tables.
    """

    # --- core geometry -----------------------------------------------------
    vertices: jax.Array       # [V, 3] f32 positions
    faces: jax.Array          # [F, 3] i32 vertex ids per face
    edges: jax.Array          # [E, 2] i32 vertex ids per undirected edge (lo < hi)
    edge_dist: jax.Array      # [E] f32 Euclidean edge lengths
    # --- derived geometry --------------------------------------------------
    face_normals: jax.Array   # [F, 3] f32 unit normals (CCW cross product)
    vertex_normals: jax.Array # [V, 3] f32 area-weighted unit normals
    # --- incidence tables (padded) ----------------------------------------
    adj_vertex: jax.Array     # [V, D] i32 neighbour vertex ids (pad: self)
    adj_edge: jax.Array       # [V, D] i32 incident edge ids (pad: 0)
    adj_mask: jax.Array       # [V, D] bool valid-slot mask
    vertex_faces: jax.Array   # [V, FD] i32 incident face ids (pad: 0)
    vertex_face_corner: jax.Array  # [V, FD] i32 corner index of v in that face
    vertex_faces_mask: jax.Array   # [V, FD] bool
    face_edges: jax.Array     # [F, 3] i32 edge id opposite corner k
    face_neighbors: jax.Array # [F, 3] i32 face across edge opposite corner k (pad: self)
    face_neighbors_mask: jax.Array  # [F, 3] bool
    # --- masks -------------------------------------------------------------
    boundary_vertex: jax.Array  # [V] bool — vertex lies on a boundary edge
    invalid: jax.Array          # [V] bool — non-manifold / broken vertices
    # (reference: mesh_map.h:447 `invalid` map populated on PanicException)

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    @property
    def num_faces(self) -> int:
        return self.faces.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edges.shape[0]

    @property
    def max_degree(self) -> int:
        return self.adj_vertex.shape[1]


def build_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    *,
    fix_nonmanifold: bool = True,
    use_native: bool | None = None,
) -> MeshArrays:
    """Build the full CSR bundle from raw (vertices, faces) on the host.

    Mirrors the preprocessing the reference performs at map load
    (mesh_map/src/mesh_map.cpp:149-425): non-manifold repair, normals, edge
    distances, incidence structure. Uses the native C++ core
    (native/meshcore.cpp) when available — required for 1M+ vertex meshes —
    with a pure-numpy fallback. Outputs are device arrays with static shapes.
    """
    vertices = np.asarray(vertices, dtype=np.float32)
    faces = np.asarray(faces, dtype=np.int32)
    if vertices.ndim != 2 or vertices.shape[1] != 3:
        raise ValueError(f"vertices must be [V,3], got {vertices.shape}")
    if faces.ndim != 2 or faces.shape[1] != 3:
        raise ValueError(f"faces must be [F,3], got {faces.shape}")

    if use_native is None or use_native:
        try:
            from mesh_navigation_tpu import native as _native

            if _native.available():
                return _build_mesh_native(vertices, faces)
            if use_native:
                raise RuntimeError("native meshcore unavailable")
        except Exception:
            if use_native:
                raise

    V = len(vertices)
    invalid = np.zeros(V, dtype=bool)

    # Drop degenerate faces (repeated vertex ids) — the reference re-exports a
    # repaired mesh when face/vertex counts mismatch (mesh_map.cpp:276-300).
    if fix_nonmanifold and len(faces):
        ok = (
            (faces[:, 0] != faces[:, 1])
            & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2])
        )
        faces = faces[ok]

    F = len(faces)

    # --- undirected edge list (lo < hi), one row per unique edge ----------
    if F:
        raw = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
        raw_sorted = np.sort(raw, axis=1)
        edges, inverse, edge_face_count = np.unique(
            raw_sorted, axis=0, return_inverse=True, return_counts=True
        )
    else:
        edges = np.zeros((0, 2), dtype=np.int32)
        inverse = np.zeros(0, dtype=np.int64)
        edge_face_count = np.zeros(0, dtype=np.int64)
    E = len(edges)

    # face_edges[f, k] = edge opposite corner k = edge between corners k+1, k+2.
    # raw rows are [F] x (01), [F] x (12), [F] x (20): edge (01) is opposite
    # corner 2, (12) opposite corner 0, (20) opposite corner 1.
    face_edges = np.zeros((F, 3), dtype=np.int32)
    if F:
        e01 = inverse[:F]
        e12 = inverse[F : 2 * F]
        e20 = inverse[2 * F :]
        face_edges[:, 2] = e01
        face_edges[:, 0] = e12
        face_edges[:, 1] = e20

    edge_vec = vertices[edges[:, 1]] - vertices[edges[:, 0]] if E else np.zeros((0, 3), np.float32)
    edge_dist = np.linalg.norm(edge_vec, axis=1).astype(np.float32)

    # boundary edges: exactly one incident face
    boundary_edge = edge_face_count == 1
    boundary_vertex = np.zeros(V, dtype=bool)
    if E:
        boundary_vertex[edges[boundary_edge].ravel()] = True
    # edges shared by >2 faces are non-manifold: mark their vertices invalid
    nonmanifold_edge = edge_face_count > 2
    if nonmanifold_edge.any():
        invalid[edges[nonmanifold_edge].ravel()] = True

    # --- vertex -> (neighbour vertex, edge) table --------------------------
    nbr_rows: list[np.ndarray] = [np.zeros(0, np.int32)] * V
    edge_rows: list[np.ndarray] = [np.zeros(0, np.int32)] * V
    if E:
        both = np.concatenate([edges, edges[:, ::-1]])  # [2E, 2] (src, dst)
        eids = np.tile(np.arange(E, dtype=np.int32), 2)
        order = np.argsort(both[:, 0], kind="stable")
        both, eids = both[order], eids[order]
        starts = np.searchsorted(both[:, 0], np.arange(V + 1))
        nbr_rows = [both[starts[v] : starts[v + 1], 1] for v in range(V)]
        edge_rows = [eids[starts[v] : starts[v + 1]] for v in range(V)]

    self_pad = np.arange(V, dtype=np.int32)[:, None]
    adj_vertex, adj_mask = _pad_rows(nbr_rows, 0)
    adj_vertex = np.where(adj_mask, adj_vertex, self_pad)
    adj_edge, _ = _pad_rows(edge_rows, 0)

    # --- vertex -> incident face (+corner) table ---------------------------
    vf_rows: list[np.ndarray] = [np.zeros(0, np.int32)] * V
    vc_rows: list[np.ndarray] = [np.zeros(0, np.int32)] * V
    if F:
        flat_v = faces.ravel()
        flat_f = np.repeat(np.arange(F, dtype=np.int32), 3)
        flat_c = np.tile(np.arange(3, dtype=np.int32), F)
        order = np.argsort(flat_v, kind="stable")
        flat_v, flat_f, flat_c = flat_v[order], flat_f[order], flat_c[order]
        starts = np.searchsorted(flat_v, np.arange(V + 1))
        vf_rows = [flat_f[starts[v] : starts[v + 1]] for v in range(V)]
        vc_rows = [flat_c[starts[v] : starts[v + 1]] for v in range(V)]
    vertex_faces, vertex_faces_mask = _pad_rows(vf_rows, 0)
    vertex_face_corner, _ = _pad_rows(vc_rows, 0)

    # --- face adjacency across edges ---------------------------------------
    face_neighbors = np.tile(np.arange(F, dtype=np.int32)[:, None], (1, 3)) if F else np.zeros((0, 3), np.int32)
    face_neighbors_mask = np.zeros((F, 3), dtype=bool)
    if F:
        # for each edge, the up-to-two incident faces
        edge_faces = np.full((E, 2), -1, dtype=np.int64)
        flat_e = face_edges.ravel()
        flat_f = np.repeat(np.arange(F, dtype=np.int64), 3)
        order = np.argsort(flat_e, kind="stable")
        fe, ff = flat_e[order], flat_f[order]
        starts = np.searchsorted(fe, np.arange(E + 1))
        for e in range(E):
            fs = ff[starts[e] : starts[e + 1]][:2]
            edge_faces[e, : len(fs)] = fs
        for k in range(3):
            e = face_edges[:, k]
            a, b = edge_faces[e, 0], edge_faces[e, 1]
            fidx = np.arange(F)
            other = np.where(a == fidx, b, a)
            ok = other >= 0
            face_neighbors[:, k] = np.where(ok, other, fidx).astype(np.int32)
            face_neighbors_mask[:, k] = ok

    # --- normals ------------------------------------------------------------
    # Cross-product face normals + area-weighted vertex normals (replaces
    # lvr2::calcFaceNormals / calcVertexNormals, used at mesh_map.cpp:342-383).
    if F:
        p0, p1, p2 = vertices[faces[:, 0]], vertices[faces[:, 1]], vertices[faces[:, 2]]
        cross = np.cross(p1 - p0, p2 - p0)
        norm = np.linalg.norm(cross, axis=1, keepdims=True)
        face_normals = (cross / np.maximum(norm, 1e-12)).astype(np.float32)
        vertex_normals = np.zeros((V, 3), dtype=np.float64)
        for k in range(3):
            np.add.at(vertex_normals, faces[:, k], cross)  # area-weighted
        vn = np.linalg.norm(vertex_normals, axis=1, keepdims=True)
        fallback = np.tile(np.array([0.0, 0.0, 1.0]), (V, 1))
        vertex_normals = np.where(vn > 1e-12, vertex_normals / np.maximum(vn, 1e-12), fallback)
        vertex_normals = vertex_normals.astype(np.float32)
    else:
        face_normals = np.zeros((0, 3), np.float32)
        vertex_normals = np.tile(np.array([0, 0, 1], np.float32), (V, 1))

    return _finalize_mesh(
        vertices=vertices,
        faces=faces,
        edges=edges.astype(np.int32),
        edge_dist=edge_dist,
        face_normals=face_normals,
        vertex_normals=vertex_normals,
        adj_vertex=adj_vertex,
        adj_edge=adj_edge,
        adj_mask=adj_mask,
        vertex_faces=vertex_faces,
        vertex_face_corner=vertex_face_corner,
        vertex_faces_mask=vertex_faces_mask,
        face_edges=face_edges,
        face_neighbors=face_neighbors,
        face_neighbors_mask=face_neighbors_mask,
        boundary_vertex=boundary_vertex,
        invalid=invalid,
    )


def _finalize_mesh(**np_arrays: np.ndarray) -> MeshArrays:
    """Upload the host tables, then register the numpy originals as host
    mirrors (host_array) so downstream plan builders never read back."""
    mesh = MeshArrays(**{k: jnp.asarray(v) for k, v in np_arrays.items()})
    register_host_arrays(mesh, np_arrays)
    return mesh


def _compute_normals(
    vertices: np.ndarray, faces: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Cross-product face normals + area-weighted vertex normals (vectorized)."""
    V, F = len(vertices), len(faces)
    if not F:
        return (
            np.zeros((0, 3), np.float32),
            np.tile(np.array([0, 0, 1], np.float32), (V, 1)),
        )
    p0, p1, p2 = vertices[faces[:, 0]], vertices[faces[:, 1]], vertices[faces[:, 2]]
    cross = np.cross(p1 - p0, p2 - p0)
    norm = np.linalg.norm(cross, axis=1, keepdims=True)
    face_normals = (cross / np.maximum(norm, 1e-12)).astype(np.float32)
    vertex_normals = np.zeros((V, 3), dtype=np.float64)
    for k in range(3):
        np.add.at(vertex_normals, faces[:, k], cross)
    vn = np.linalg.norm(vertex_normals, axis=1, keepdims=True)
    fallback = np.tile(np.array([0.0, 0.0, 1.0]), (V, 1))
    vertex_normals = np.where(vn > 1e-12, vertex_normals / np.maximum(vn, 1e-12), fallback)
    return face_normals, vertex_normals.astype(np.float32)


def _face_neighbors_from_edges(
    face_edges: np.ndarray, num_edges: int
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized face adjacency across shared edges."""
    F = len(face_edges)
    face_neighbors = np.tile(np.arange(F, dtype=np.int32)[:, None], (1, 3))
    face_neighbors_mask = np.zeros((F, 3), dtype=bool)
    if not F:
        return face_neighbors, face_neighbors_mask
    flat_e = face_edges.ravel()
    flat_f = np.repeat(np.arange(F, dtype=np.int64), 3)
    order = np.argsort(flat_e, kind="stable")
    fe, ff = flat_e[order], flat_f[order]
    starts = np.searchsorted(fe, np.arange(num_edges + 1))
    cnt = np.diff(starts)
    first = np.full(num_edges, -1, np.int64)
    second = np.full(num_edges, -1, np.int64)
    has1 = cnt > 0
    has2 = cnt > 1
    first[has1] = ff[starts[:-1][has1]]
    second[has2] = ff[starts[:-1][has2] + 1]
    fidx = np.arange(F)
    for k in range(3):
        e = face_edges[:, k]
        a, b = first[e], second[e]
        other = np.where(a == fidx, b, a)
        ok = other >= 0
        face_neighbors[:, k] = np.where(ok, other, fidx).astype(np.int32)
        face_neighbors_mask[:, k] = ok
    return face_neighbors, face_neighbors_mask


def _build_mesh_native(vertices: np.ndarray, faces: np.ndarray) -> MeshArrays:
    """CSR construction through the C++ meshcore (native/meshcore.cpp)."""
    from mesh_navigation_tpu.native import NativeMesh

    nm = NativeMesh(vertices, faces)
    t = nm.tables()
    face_normals, vertex_normals = _compute_normals(vertices, t["faces"])
    face_neighbors, face_neighbors_mask = _face_neighbors_from_edges(
        t["face_edges"], nm.E
    )
    return _finalize_mesh(
        vertices=vertices,
        faces=t["faces"],
        edges=t["edges"],
        edge_dist=t["edge_dist"],
        face_normals=face_normals,
        vertex_normals=vertex_normals,
        adj_vertex=t["adj_vertex"],
        adj_edge=t["adj_edge"],
        adj_mask=t["adj_mask"].astype(bool),
        vertex_faces=t["vf_face"],
        vertex_face_corner=t["vf_corner"],
        vertex_faces_mask=t["vf_mask"].astype(bool),
        face_edges=t["face_edges"],
        face_neighbors=face_neighbors,
        face_neighbors_mask=face_neighbors_mask,
        boundary_vertex=t["boundary"].astype(bool),
        invalid=t["invalid"].astype(bool),
    )
