"""Batched ray/mesh casting — the TPU replacement for Embree/BVH raycasters.

The reference builds an `lvr2::EmbreeRaycaster` (or BVH fallback) at map load
(mesh_map.cpp:315-324) and uses it for (a) the obstacle layer's batch raycast
of sensor points (obstacle_layer.cpp:229-239) and (b) normal-clearance
computation. On TPU we cast rays against face buckets from a uniform spatial
grid when available, falling back to chunked brute force (every ray against
every face tile) which is perfectly regular compute and fine up to ~100k faces
per query batch.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from mesh_navigation_tpu.mesh.arrays import MeshArrays, host_array
from mesh_navigation_tpu.mesh import geometry

INF = jnp.inf


def raycast_bruteforce(
    mesh: MeshArrays,
    origins: jax.Array,      # [N, 3]
    directions: jax.Array,   # [N, 3]
    *,
    face_chunk: int = 4096,
    exclude_origin_faces: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Cast N rays against all faces; nearest front-face hit per ray.

    Returns (t [N], face_id [N] (-1 = miss), hit [N] bool) — the
    `castRays -> (hit, dist, face_id)` contract of the lvr2 raycasters
    (SURVEY.md §2.2). One-sided, t >= 0, matching
    MeshMap::rayTriangleIntersect semantics (mesh_map.cpp:1247-1305).
    """
    F = mesh.num_faces
    tris = mesh.vertices[mesh.faces]               # [F, 3, 3]
    n_chunks = -(-F // face_chunk)
    pad = n_chunks * face_chunk - F
    tris_p = jnp.pad(tris, ((0, pad), (0, 0), (0, 0)))
    valid_f = jnp.arange(n_chunks * face_chunk) < F

    def body(carry, chunk_idx):
        best_t, best_f = carry
        sl = chunk_idx * face_chunk
        tri_c = jax.lax.dynamic_slice_in_dim(tris_p, sl, face_chunk, axis=0)
        ok_c = jax.lax.dynamic_slice_in_dim(valid_f, sl, face_chunk, axis=0)
        t, hit = geometry.ray_triangle_intersect(
            origins[:, None, :], directions[:, None, :], tri_c[None, :, :, :]
        )                                            # [N, face_chunk]
        t = jnp.where(hit & ok_c[None, :], t, INF)
        tmin = jnp.min(t, axis=1)
        fmin = jnp.argmin(t, axis=1).astype(jnp.int32) + sl
        better = tmin < best_t
        return (jnp.where(better, tmin, best_t), jnp.where(better, fmin, best_f)), None

    init = (jnp.full(origins.shape[0], INF), jnp.full(origins.shape[0], -1, jnp.int32))
    (t, f), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    hit = jnp.isfinite(t)
    return t, jnp.where(hit, f, -1), hit


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FaceGrid2D:
    """Uniform xy binning of faces for vertical (±z) rays — the obstacle
    layer's `down_axis` raycast (obstacle_layer.cpp:229-239) only ever casts
    straight down, so a 2D bin replaces the full BVH."""
    origin: jax.Array        # [2] f32
    cell_size: jax.Array     # [] f32
    dims: jax.Array          # [2] i32
    cell_faces: jax.Array    # [C, K] i32 face ids per cell (pad 0)
    cell_mask: jax.Array     # [C, K] bool


def build_face_grid(mesh: MeshArrays, cell_size: float | None = None) -> FaceGrid2D:
    """Host-side: bin each face into every xy cell its AABB overlaps."""
    import numpy as np

    tris = host_array(mesh, "vertices")[host_array(mesh, "faces")]   # [F, 3, 3]
    F = len(tris)
    if cell_size is None:
        ed = host_array(mesh, "edge_dist")
        cell_size = 2.0 * float(ed.mean()) if len(ed) else 1.0
    lo = tris[..., :2].min(axis=(0, 1)) - 1e-4
    hi = tris[..., :2].max(axis=(0, 1)) + 1e-4
    dims = np.maximum(np.ceil((hi - lo) / cell_size).astype(np.int64), 1)
    fmin = np.floor((tris[..., :2].min(axis=1) - lo) / cell_size).astype(np.int64)
    fmax = np.floor((tris[..., :2].max(axis=1) - lo) / cell_size).astype(np.int64)
    fmin = np.clip(fmin, 0, dims - 1)
    fmax = np.clip(fmax, 0, dims - 1)
    C = int(dims[0] * dims[1])
    buckets: list[list[int]] = [[] for _ in range(C)]
    for f in range(F):
        for cx in range(fmin[f, 0], fmax[f, 0] + 1):
            for cy in range(fmin[f, 1], fmax[f, 1] + 1):
                buckets[cx * dims[1] + cy].append(f)
    K = max(1, max((len(b) for b in buckets), default=1))
    cell_faces = np.zeros((C, K), np.int32)
    cell_mask = np.zeros((C, K), bool)
    for c, b in enumerate(buckets):
        cell_faces[c, : len(b)] = b
        cell_mask[c, : len(b)] = True
    return FaceGrid2D(
        origin=jnp.asarray(lo.astype(np.float32)),
        cell_size=jnp.float32(cell_size),
        dims=jnp.asarray(dims.astype(np.int32)),
        cell_faces=jnp.asarray(cell_faces),
        cell_mask=jnp.asarray(cell_mask),
    )


def raycast_vertical(
    mesh: MeshArrays,
    fgrid: FaceGrid2D,
    origins: jax.Array,       # [N, 3]
    *,
    down: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Nearest hit for vertical rays using the xy face bins: each ray tests
    only its cell's K candidate faces. Returns (t, face_id, hit) like
    `raycast_bruteforce`."""
    direction = jnp.asarray([0.0, 0.0, -1.0 if down else 1.0], jnp.float32)
    cell = jnp.floor((origins[:, :2] - fgrid.origin) / fgrid.cell_size).astype(jnp.int32)
    inside = jnp.all((cell >= 0) & (cell < fgrid.dims[None, :]), axis=-1)
    cell = jnp.clip(cell, 0, fgrid.dims - 1)
    cid = cell[:, 0] * fgrid.dims[1] + cell[:, 1]
    cands = fgrid.cell_faces[cid]                                # [N, K]
    cmask = fgrid.cell_mask[cid] & inside[:, None]
    tri = mesh.vertices[mesh.faces[cands]]                       # [N, K, 3, 3]
    t, hit = geometry.ray_triangle_intersect(
        origins[:, None, :], direction[None, None, :], tri
    )
    t = jnp.where(hit & cmask, t, INF)
    tmin = jnp.min(t, axis=1)
    fbest = jnp.take_along_axis(cands, jnp.argmin(t, axis=1)[:, None], axis=1)[:, 0]
    ok = jnp.isfinite(tmin)
    return tmin, jnp.where(ok, fbest, -1), ok


def vertex_clearance(
    mesh: MeshArrays,
    max_dist: float,
    *,
    offset: float = 1e-3,
    face_chunk: int = 4096,
) -> jax.Array:
    """Free space along each vertex normal — replaces
    lvr2::calcNormalClearance (clearance_layer.cpp:161). Rays start slightly
    off the surface to avoid self-hits; misses → max_dist (open sky)."""
    origins = mesh.vertices + mesh.vertex_normals * offset
    t, _, hit = raycast_bruteforce(
        mesh, origins, mesh.vertex_normals, face_chunk=face_chunk
    )
    t = t + offset
    return jnp.where(hit & (t < max_dist), t, max_dist).astype(jnp.float32)
