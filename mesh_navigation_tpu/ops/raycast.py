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

import functools

import jax
import jax.numpy as jnp

from mesh_navigation_tpu.mesh.arrays import MeshArrays
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
