"""On-surface tracking: face re-acquisition, field sampling, surface walking.

Device-side equivalents of the MeshMap query kit the controller and the CVP
back-tracker lean on: projectedBarycentricCoords face tracking
(mesh_controller.cpp:79-144), `directionAtPosition` / `costAtPosition`
barycentric blends (mesh_map.cpp:625-672), and the `meshAhead` surface walk
(mesh_map.cpp:1070-1108). All pure functions over (MeshArrays, SpatialGrid),
vmap-able across thousands of simultaneous agents.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mesh_navigation_tpu.mesh.arrays import MeshArrays
from mesh_navigation_tpu.mesh import geometry, query


class FaceFix(NamedTuple):
    """Result of locating a position on the mesh surface."""
    face: jax.Array      # [] i32 (-1 = lost)
    bary: jax.Array      # [3]
    position: jax.Array  # [3] — input projected onto the surface
    found: jax.Array     # [] bool


def locate(
    mesh: MeshArrays,
    grid: query.SpatialGrid,
    position: jax.Array,
    current_face: jax.Array,
    *,
    max_dist: float = 0.4,
    hops: int = 2,
) -> FaceFix:
    """Three-stage face tracking, in the controller's order
    (mesh_controller.cpp:98-141): (1) project into the current face,
    (2) bounded neighbour-face search, (3) global containing-face search.
    `current_face = -1` forces the global path (first cycle,
    mesh_controller.cpp:79-97)."""
    has_face = current_face >= 0
    safe_face = jnp.maximum(current_face, 0)

    tri = mesh.vertices[mesh.faces[safe_face]]
    bary0, dist0, inside0 = geometry.projected_barycentric_coords(position, tri)
    ok0 = has_face & inside0 & (jnp.abs(dist0) < max_dist)

    nb_face, nb_bary, nb_found = query.neighbour_face_search(
        mesh, position, safe_face, max_dist, hops=hops
    )
    ok1 = has_face & ~ok0 & nb_found

    g_face, g_bary, g_dist, g_found = query.containing_face(
        mesh, grid, position, max_dist
    )
    ok2 = ~ok0 & ~ok1 & g_found

    face = jnp.where(ok0, safe_face, jnp.where(ok1, nb_face, jnp.where(ok2, g_face, -1)))
    bary = jnp.where(ok0, bary0, jnp.where(ok1, nb_bary, g_bary))
    found = ok0 | ok1 | ok2
    # project onto the located face's plane (linearCombineBarycentricCoords
    # of the face vertices — mesh_controller.cpp:91,125)
    proj_tri = mesh.vertices[mesh.faces[jnp.maximum(face, 0)]]
    projected = geometry.bary_interpolate(proj_tri, bary)
    pos_out = jnp.where(found, projected, position)
    return FaceFix(face=face, bary=bary, position=pos_out, found=found)


def locate_batch(
    mesh: MeshArrays,
    grid: query.SpatialGrid,
    positions: jax.Array,       # [B, 3]
    current_faces: jax.Array,   # [B] i32 (-1 = no tracked face)
    *,
    max_dist: float = 0.4,
    hops: int = 2,
) -> FaceFix:
    """Batched `locate` with whole-batch stage gating: the neighbour-face
    BFS and the global grid search run only when some lane actually needs
    them (`lax.cond` at batch level — a per-lane cond under vmap lowers to
    select and executes both branches for every lane). In steady-state
    tracking almost every lane resolves in stage 1, so the two expensive
    stages are skipped wholesale; on a cold start (all faces -1) the BFS is
    skipped and only the global search runs."""
    B = positions.shape[0]
    dt = positions.dtype
    has_face = current_faces >= 0
    safe_face = jnp.maximum(current_faces, 0)

    tri = mesh.vertices[mesh.faces[safe_face]]              # [B, 3, 3]
    bary0, dist0, inside0 = jax.vmap(
        geometry.projected_barycentric_coords
    )(positions, tri)
    ok0 = has_face & inside0 & (jnp.abs(dist0) < max_dist)

    def nb_run(_):
        return jax.vmap(
            lambda p, f: query.neighbour_face_search(
                mesh, p, f, max_dist, hops=hops
            )
        )(positions, safe_face)

    def nb_skip(_):
        return (
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B, 3), dt),
            jnp.zeros((B,), bool),
        )

    nb_face, nb_bary, nb_found = jax.lax.cond(
        jnp.any(has_face & ~ok0), nb_run, nb_skip, None
    )
    ok1 = has_face & ~ok0 & nb_found

    def g_run(_):
        return jax.vmap(
            lambda p: query.containing_face(mesh, grid, p, max_dist)
        )(positions)

    def g_skip(_):
        return (
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B, 3), dt),
            jnp.zeros((B,), dt),
            jnp.zeros((B,), bool),
        )

    g_face, g_bary, g_dist, g_found = jax.lax.cond(
        jnp.any(~ok0 & ~ok1), g_run, g_skip, None
    )
    ok2 = ~ok0 & ~ok1 & g_found

    face = jnp.where(
        ok0, safe_face, jnp.where(ok1, nb_face, jnp.where(ok2, g_face, -1))
    )
    bary = jnp.where(
        ok0[:, None], bary0, jnp.where(ok1[:, None], nb_bary, g_bary)
    )
    found = ok0 | ok1 | ok2
    proj_tri = mesh.vertices[mesh.faces[jnp.maximum(face, 0)]]
    projected = jax.vmap(geometry.bary_interpolate)(proj_tri, bary)
    pos_out = jnp.where(found[:, None], projected, positions)
    return FaceFix(face=face, bary=bary, position=pos_out, found=found)


def direction_at(
    mesh: MeshArrays,
    vector_map: jax.Array,   # [V, 3]
    face: jax.Array,
    bary: jax.Array,
) -> jax.Array:
    """Barycentric blend of the per-vertex direction field
    (MeshMap::directionAtPosition, mesh_map.cpp:625-650)."""
    vids = mesh.faces[jnp.maximum(face, 0)]
    return geometry.bary_interpolate(vector_map[vids], bary)


def cost_at(
    mesh: MeshArrays,
    vertex_costs: jax.Array,  # [V]
    face: jax.Array,
    bary: jax.Array,
) -> jax.Array:
    """Barycentric cost blend (MeshMap::costAtPosition, mesh_map.cpp:652-672)."""
    vids = mesh.faces[jnp.maximum(face, 0)]
    return geometry.bary_interpolate(vertex_costs[vids], bary)


def mesh_ahead(
    mesh: MeshArrays,
    grid: query.SpatialGrid,
    vector_map: jax.Array,
    position: jax.Array,
    face: jax.Array,
    step_size: float | jax.Array,
    *,
    layer_vectors: jax.Array | None = None,
    max_dist: float = 0.4,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One surface-walk step along the vector field — MeshMap::meshAhead
    (mesh_map.cpp:1070-1108): re-project / re-acquire the face, blend the
    planner field with the per-layer repulsive fields at the barycentric
    position, normalize, step. Returns (new_position, new_face, ok)."""
    fix = locate(mesh, grid, position, face, max_dist=max_dist)
    d = direction_at(mesh, vector_map, fix.face, fix.bary)
    d = geometry.normalize(d)
    if layer_vectors is not None:
        d = d + direction_at(mesh, layer_vectors, fix.face, fix.bary)
    d = geometry.normalize(d)
    has_dir = jnp.linalg.norm(d) > 1e-6
    ok = fix.found & has_dir
    new_pos = jnp.where(ok, fix.position + d * step_size, position)
    return new_pos, fix.face, ok
