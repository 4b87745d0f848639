"""Label-correcting shortest-path sweeps — the TPU replacement for Dijkstra.

The reference's global planner pops one vertex at a time from an addressable
min-heap and relaxes its incident edges (dijkstra_mesh_planner.cpp:287-348,
`lvr2::Meap`). That is inherently sequential. Here the same fixed point is
reached by *pull-based* Jacobi relaxation: every vertex simultaneously takes

    dist[v] <- min(dist[v], min_u (dist[u] + w(u, v)))

over its padded neighbour table — one dense gather + rowwise min per sweep,
iterated under `lax.while_loop` until no label changes. Monotone convergence
guarantees the same fixed point as Dijkstra; predecessors carry over so the
potential field, vector field and path extraction match the reference
(dijkstra_mesh_planner.cpp:189-209, 367-373).

All functions are batched: a leading `B` axis over scenarios is handled by
`vmap` at the planner level.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mesh_navigation_tpu.mesh.arrays import MeshArrays

INF = jnp.inf


def compute_edge_weights(
    mesh: MeshArrays,
    vertex_costs: jax.Array,
    edge_cost_factor: float | jax.Array = 0.0,
) -> jax.Array:
    """Per-edge weights `w = dist + factor · dist · (c1 + c2) / 2`.

    Exact parity with MeshMap::computeEdgeWeights (mesh_map.cpp:517-561):
    infinite if either endpoint cost is infinite.
    """
    c1 = vertex_costs[mesh.edges[:, 0]]
    c2 = vertex_costs[mesh.edges[:, 1]]
    dist = mesh.edge_dist
    w = dist + edge_cost_factor * dist * (c1 + c2) * 0.5
    return jnp.where(jnp.isinf(c1) | jnp.isinf(c2), INF, w)


def slot_weights(
    mesh: MeshArrays,
    edge_weights: jax.Array,
    vertex_costs: jax.Array,
    cost_limit: float | jax.Array = 1.0,
) -> jax.Array:
    """Effective per-(vertex, slot) weight for pull relaxation: [V, D].

    Encodes the reference's traversability rules as +inf entries:
    - padded slots,
    - relaxation *from* a vertex whose combined cost exceeds `cost_limit`
      (the popped-vertex skip at dijkstra_mesh_planner.cpp:302-303),
    - invalid (non-manifold) endpoints (dijkstra_mesh_planner.cpp:305-319).
    """
    w = edge_weights[mesh.adj_edge]                      # [V, D]
    src = mesh.adj_vertex                                # [V, D] neighbour = relaxation source
    blocked_src = (vertex_costs[src] > cost_limit) | mesh.invalid[src]
    blocked_dst = mesh.invalid[:, None]
    usable = mesh.adj_mask & ~blocked_src & ~blocked_dst
    return jnp.where(usable, w, INF)


def slot_weights_np(
    mesh: MeshArrays,
    vertex_costs: "np.ndarray",
    cost_limit: float = 1.0,
    edge_cost_factor: float = 0.0,
) -> "np.ndarray":
    """Numpy mirror of compute_edge_weights + slot_weights for host-side plan
    construction (offset/banded classification) — avoids the device->host
    pull of the [V, D] weight table, which is prohibitive over a tunneled
    backend (mesh/arrays.py host_array rationale)."""
    import numpy as np

    from mesh_navigation_tpu.mesh.arrays import host_array

    costs = np.asarray(vertex_costs, np.float32)
    edges = host_array(mesh, "edges")
    dist = host_array(mesh, "edge_dist")
    c1 = costs[edges[:, 0]]
    c2 = costs[edges[:, 1]]
    ew = dist + edge_cost_factor * dist * (c1 + c2) * 0.5
    ew = np.where(np.isinf(c1) | np.isinf(c2), np.inf, ew).astype(np.float32)

    adj_v = host_array(mesh, "adj_vertex")
    adj_e = host_array(mesh, "adj_edge")
    adj_m = host_array(mesh, "adj_mask")
    invalid = host_array(mesh, "invalid")
    w = ew[adj_e]
    blocked_src = (costs[adj_v] > cost_limit) | invalid[adj_v]
    usable = adj_m & ~blocked_src & ~invalid[:, None]
    return np.where(usable, w, np.inf).astype(np.float32)


class FieldResult(NamedTuple):
    """Potential field + predecessor map from a seeded sweep solve."""
    dist: jax.Array        # [V] f32 geodesic potential (inf = unreached)
    pred: jax.Array        # [V] i32 predecessor vertex (self = none)
    sweeps: jax.Array      # i32 number of relaxation sweeps executed
    converged: jax.Array   # bool


def shortest_path_field(
    mesh: MeshArrays,
    weights_vd: jax.Array,
    seed_vertex: jax.Array,
    *,
    max_sweeps: int = 0,
    block_sweeps: int = 8,
) -> FieldResult:
    """Single-source shortest path over the vertex graph by Jacobi sweeps.

    `weights_vd` is the [V, D] effective slot-weight table from
    `slot_weights`. `seed_vertex` is a scalar int (the goal vertex — the
    reference seeds Dijkstra at the goal so the field points toward it,
    dijkstra_mesh_planner.cpp:80-81, 272-276).
    """
    V, D = weights_vd.shape
    if max_sweeps <= 0:
        max_sweeps = 4 * V  # safe upper bound; convergence exits earlier
    n_blocks = -(-max_sweeps // block_sweeps)

    vidx = jnp.arange(V, dtype=jnp.int32)
    dist0 = jnp.where(vidx == seed_vertex, 0.0, INF).astype(jnp.float32)
    pred0 = vidx

    adj = mesh.adj_vertex

    def one_sweep(carry):
        dist, pred = carry
        cand = dist[adj] + weights_vd                    # [V, D]
        best = jnp.min(cand, axis=1)
        arg = jnp.argmin(cand, axis=1)
        improved = best < dist
        new_dist = jnp.where(improved, best, dist)
        new_pred = jnp.where(improved, adj[vidx, arg], pred)
        return new_dist, new_pred

    def block(carry):
        dist, pred, it, _ = carry
        new_dist, new_pred = jax.lax.fori_loop(
            0, block_sweeps, lambda _, c: one_sweep(c), (dist, pred)
        )
        changed = jnp.any(new_dist < dist)
        return new_dist, new_pred, it + block_sweeps, changed

    def cond(carry):
        _, _, it, changed = carry
        return changed & (it < n_blocks * block_sweeps)

    dist, pred, sweeps, changed = jax.lax.while_loop(
        cond, block, (dist0, pred0, jnp.int32(0), jnp.bool_(True))
    )
    return FieldResult(dist=dist, pred=pred, sweeps=sweeps, converged=~changed)


def vector_map_from_predecessors(mesh: MeshArrays, pred: jax.Array) -> jax.Array:
    """Per-vertex unit direction toward the predecessor (≈ toward the goal).

    Parity with DijkstraMeshPlanner::computeVectorMap
    (dijkstra_mesh_planner.cpp:189-209): `normalize(pos[pred] - pos[v])`,
    zero where the predecessor is the vertex itself.
    """
    vidx = jnp.arange(mesh.num_vertices, dtype=jnp.int32)
    d = mesh.vertices[pred] - mesh.vertices
    has_pred = pred != vidx
    n = jnp.linalg.norm(d, axis=-1, keepdims=True)
    unit = d / jnp.maximum(n, 1e-12)
    return jnp.where(has_pred[:, None], unit, 0.0)


def vector_rows_from_predecessors(
    mesh: MeshArrays, pred: jax.Array, vids: jax.Array
) -> jax.Array:
    """`vector_map_from_predecessors` evaluated only at `vids` ([K] i32) —
    the controller samples the field at the 3 vertices of the tracked face,
    so at large V the full [V, 3] (or [B, V, 3] batched) field never needs to
    materialize. Returns [K, 3]."""
    p = pred[vids]
    d = mesh.vertices[p] - mesh.vertices[vids]
    has_pred = p != vids
    n = jnp.linalg.norm(d, axis=-1, keepdims=True)
    unit = d / jnp.maximum(n, 1e-12)
    return jnp.where(has_pred[:, None], unit, 0.0)


def extract_path(
    pred: jax.Array,
    start_vertex: jax.Array,
    goal_vertex: jax.Array,
    max_len: int,
) -> tuple[jax.Array, jax.Array]:
    """Follow the predecessor chain from start to the (goal-seeded) source.

    Returns (path_vertices [max_len] i32, valid [max_len] bool). The first
    entry is `start_vertex`; the chain ends at `goal_vertex` (predecessor
    backtracking, dijkstra_mesh_planner.cpp:367-373). Padding repeats the
    terminal vertex with valid=False.
    """

    def step(carry, _):
        v, alive = carry
        nxt = pred[v]
        reached_end = (v == goal_vertex) | (nxt == v)
        new_alive = alive & ~reached_end
        return (jnp.where(new_alive, nxt, v), new_alive), (v, alive)

    (_, _), (path, valid) = jax.lax.scan(
        step, (start_vertex, jnp.bool_(True)), None, length=max_len
    )
    return path, valid


def path_cost(
    vertices: jax.Array, path: jax.Array, valid: jax.Array
) -> jax.Array:
    """Sum of Euclidean segment lengths along a (padded) vertex path —
    matches how makePlan accumulates `cost` from consecutive pose positions
    (dijkstra_mesh_planner.cpp:92-117)."""
    pts = vertices[path]
    seg = jnp.linalg.norm(pts[1:] - pts[:-1], axis=-1)
    seg_valid = valid[1:] & valid[:-1]
    return jnp.sum(jnp.where(seg_valid, seg, 0.0))
