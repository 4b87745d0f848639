"""The six local cost layers, fused into vectorized neighborhood passes.

Reference behavior (SURVEY.md §2.1 C4-C9): each layer produces per-vertex
costs + a lethal set from local geometry. The lvr2 geometry kernels they
delegate to (calcVertexHeightDifferences, calcVertexRoughness,
calcBorderCosts, calcNormalClearance, visitLocalVertexNeighborhood) are
replaced by gathers over a precomputed padded radius-neighborhood table —
every layer is then a handful of fused VPU ops over [V, K] gathers.
"""

from __future__ import annotations

import collections

import numpy as np
import jax
import jax.numpy as jnp

from mesh_navigation_tpu.config import LayerConfig
from mesh_navigation_tpu.layers.base import LayerOutput, register_layer, zero_vectors
from mesh_navigation_tpu.mesh.arrays import MeshArrays, host_array

INF = jnp.inf


def radius_neighborhood(mesh: MeshArrays, radius: float) -> tuple[np.ndarray, np.ndarray]:
    """Padded table of vertices within Euclidean `radius`, discovered by BFS
    along mesh edges from each vertex (the access pattern of
    lvr2::visitLocalVertexNeighborhood used by HeightDiff/Roughness/Ridge —
    ridge_layer.cpp:155-184). Host-side, once per (mesh, radius).

    Returns (neigh [V, K] int32 — pad: self, mask [V, K] bool). The vertex
    itself is NOT included (matches the visitor, which starts from the
    neighbors).
    """
    try:
        from mesh_navigation_tpu import native as _native

        if _native.available():
            nm = _native.NativeMesh(host_array(mesh, "vertices"), host_array(mesh, "faces"))
            return nm.radius_neighborhood(float(radius))
    except Exception:
        pass
    pos = host_array(mesh, "vertices")
    adj = host_array(mesh, "adj_vertex")
    amask = host_array(mesh, "adj_mask")
    V = len(pos)
    r2 = radius * radius
    rows: list[list[int]] = []
    for v in range(V):
        seen = {v}
        out: list[int] = []
        frontier = collections.deque(int(u) for u in adj[v][amask[v]])
        seen.update(frontier)
        while frontier:
            u = frontier.popleft()
            d2 = float(np.sum((pos[u] - pos[v]) ** 2))
            if d2 > r2:
                continue
            out.append(u)
            for w in adj[u][amask[u]]:
                w = int(w)
                if w not in seen:
                    seen.add(w)
                    frontier.append(w)
        rows.append(out)
    K = max(1, max(len(r) for r in rows))
    neigh = np.tile(np.arange(V, dtype=np.int32)[:, None], (1, K))
    mask = np.zeros((V, K), dtype=bool)
    for v, r in enumerate(rows):
        neigh[v, : len(r)] = r
        mask[v, : len(r)] = True
    return neigh, mask


def _neighborhood_state(radius: float, state_key: str):
    def prepare(m: MeshArrays) -> dict:
        neigh, mask = radius_neighborhood(m, radius)
        return {state_key: (jnp.asarray(neigh), jnp.asarray(mask))}
    return prepare


@register_layer("height_diff")
def make_height_diff(cfg: LayerConfig):
    """Local height spread within `radius` — replaces
    lvr2::calcVertexHeightDifferences (height_diff_layer.cpp:108): for each
    vertex, max minus min z over the radius neighborhood (including self).
    Lethal iff value > threshold (height_diff_layer.cpp:67-79); defaults
    threshold=0.185, radius=0.3 (height_diff_layer.h:131-134)."""
    threshold = cfg.param("threshold", 0.185)
    radius = cfg.param("radius", 0.3)
    key = f"neigh:{radius}"

    def fn(mesh: MeshArrays, inputs, state) -> LayerOutput:
        neigh, mask = state[key]
        z = mesh.vertices[:, 2]
        nz = jnp.where(mask, z[neigh], z[:, None])
        zmax = jnp.maximum(jnp.max(nz, axis=1), z)
        zmin = jnp.minimum(jnp.min(nz, axis=1), z)
        costs = (zmax - zmin).astype(jnp.float32)
        return LayerOutput(costs=costs, lethal=costs > threshold, vectors=zero_vectors(mesh))

    fn.prepare = _neighborhood_state(radius, key)  # type: ignore[attr-defined]
    return fn


@register_layer("roughness")
def make_roughness(cfg: LayerConfig):
    """Local normal dispersion — replaces lvr2::calcVertexRoughness
    (roughness_layer.cpp:143-144): mean angle between the vertex normal and
    its radius-neighborhood normals. Lethal iff > threshold
    (roughness_layer.cpp:77-87); defaults threshold=0.3, radius=0.3."""
    threshold = cfg.param("threshold", 0.3)
    radius = cfg.param("radius", 0.3)
    key = f"neigh:{radius}"

    def fn(mesh: MeshArrays, inputs, state) -> LayerOutput:
        neigh, mask = state[key]
        n = mesh.vertex_normals
        cos = jnp.clip(jnp.sum(n[:, None, :] * n[neigh], axis=-1), -1.0, 1.0)
        ang = jnp.arccos(cos)
        cnt = jnp.maximum(jnp.sum(mask, axis=1), 1)
        costs = (jnp.sum(jnp.where(mask, ang, 0.0), axis=1) / cnt).astype(jnp.float32)
        return LayerOutput(costs=costs, lethal=costs > threshold, vectors=zero_vectors(mesh))

    fn.prepare = _neighborhood_state(radius, key)  # type: ignore[attr-defined]
    return fn


@register_layer("steepness")
def make_steepness(cfg: LayerConfig):
    """Per-vertex steepness = acos(normal.z) (steepness_layer.cpp:157-166);
    lethal iff > threshold (steepness_layer.cpp:82-93); default 0.3."""
    threshold = cfg.param("threshold", 0.3)

    def fn(mesh: MeshArrays, inputs, state) -> LayerOutput:
        nz = jnp.clip(mesh.vertex_normals[:, 2], -1.0, 1.0)
        costs = jnp.arccos(nz).astype(jnp.float32)
        return LayerOutput(costs=costs, lethal=costs > threshold, vectors=zero_vectors(mesh))

    return fn


@register_layer("ridge")
def make_ridge(cfg: LayerConfig):
    """Ridge indicator (ridge_layer.cpp:155-184): mean distance between the
    neighbors' (p + n) and the vertex's own (p + n) within the radius;
    vertices with no neighbors get threshold + 0.1 (ridge_layer.cpp:162,179).
    Defaults threshold=0.3, radius=0.3."""
    threshold = cfg.param("threshold", 0.3)
    radius = cfg.param("radius", 0.3)
    key = f"neigh:{radius}"

    def fn(mesh: MeshArrays, inputs, state) -> LayerOutput:
        neigh, mask = state[key]
        pn = mesh.vertices + mesh.vertex_normals
        d = jnp.linalg.norm(pn[neigh] - pn[:, None, :], axis=-1)
        cnt = jnp.sum(mask, axis=1)
        mean = jnp.sum(jnp.where(mask, d, 0.0), axis=1) / jnp.maximum(cnt, 1)
        costs = jnp.where(cnt > 0, mean, threshold + 0.1).astype(jnp.float32)
        return LayerOutput(costs=costs, lethal=costs > threshold, vectors=zero_vectors(mesh))

    fn.prepare = _neighborhood_state(radius, key)  # type: ignore[attr-defined]
    return fn


@register_layer("border")
def make_border(cfg: LayerConfig):
    """Constant `border_cost` on boundary vertices — replaces
    lvr2::calcBorderCosts (border_layer.cpp:104-110); lethal iff > threshold
    (0.5); defaults border_cost=1.0."""
    border_cost = cfg.param("border_cost", 1.0)
    threshold = cfg.param("threshold", 0.5)

    def fn(mesh: MeshArrays, inputs, state) -> LayerOutput:
        costs = jnp.where(mesh.boundary_vertex, border_cost, 0.0).astype(jnp.float32)
        return LayerOutput(costs=costs, lethal=costs > threshold, vectors=zero_vectors(mesh))

    return fn


@register_layer("clearance")
def make_clearance(cfg: LayerConfig):
    """Free headroom along the vertex normal — replaces
    lvr2::calcNormalClearance (clearance_layer.cpp:161) with a batched
    device raycast; cost mapping per clearance_layer.cpp:67-99:
    < robot_height -> 1.0 (lethal); < robot_height + height_inflation ->
    cosine fade (cos(diff·π/height_inflation... see below) + 1)/2; else 0.
    Defaults robot_height=0.5, height_inflation=0.3."""
    robot_height = cfg.param("robot_height", 0.5)
    height_inflation = cfg.param("height_inflation", 0.3)
    max_dist = robot_height + height_inflation + 0.1

    def prepare(m: MeshArrays) -> dict:
        # 3D face grid: O(V·probe·steps) normal rays instead of O(V·F)
        # brute force — required at 1M vertices (the full configs[2]/[3]
        # layer stack)
        from mesh_navigation_tpu.ops.raycast import build_face_grid3d

        return {"clearance:grid3d": build_face_grid3d(m)}

    def fn(mesh: MeshArrays, inputs, state) -> LayerOutput:
        from mesh_navigation_tpu.ops.raycast import (
            vertex_clearance, vertex_clearance_grid,
        )

        g = state.get("clearance:grid3d")
        if g is not None:
            clearance = vertex_clearance_grid(mesh, g, max_dist)
        else:
            clearance = vertex_clearance(mesh, max_dist=max_dist)
        diff = clearance - robot_height
        fade = (jnp.cos(diff * jnp.pi / jnp.maximum(height_inflation, 1e-6)) + 1.0) * 0.5
        costs = jnp.where(
            clearance < robot_height,
            1.0,
            jnp.where(clearance < robot_height + height_inflation, fade, 0.0),
        ).astype(jnp.float32)
        lethal = clearance < robot_height
        return LayerOutput(costs=costs, lethal=lethal, vectors=zero_vectors(mesh))

    fn.prepare = prepare  # type: ignore[attr-defined]
    return fn
