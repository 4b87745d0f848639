"""Sweep solver vs. sequential Dijkstra oracle — vertex-wise potential parity
(the validation style BASELINE.md prescribes)."""

import numpy as np
import jax
import jax.numpy as jnp

from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.ops import sweeps
from mesh_navigation_tpu.utils import oracle


def _solve_both(mesh, vertex_costs, seed, cost_limit=1.0, edge_cost_factor=0.0):
    ew = sweeps.compute_edge_weights(mesh, jnp.asarray(vertex_costs), edge_cost_factor)
    W = sweeps.slot_weights(mesh, ew, jnp.asarray(vertex_costs), cost_limit)
    res = sweeps.shortest_path_field(mesh, W, jnp.int32(seed))
    adj = oracle.mesh_adjacency(mesh)
    od, op = oracle.dijkstra_oracle(
        mesh.num_vertices, adj, np.asarray(ew), np.asarray(vertex_costs), seed, cost_limit
    )
    return res, od, op


def test_flat_grid_exact(grid_mesh_small):
    m = grid_mesh_small
    costs = np.zeros(m.num_vertices, np.float32)
    res, od, _ = _solve_both(m, costs, seed=0)
    np.testing.assert_allclose(np.asarray(res.dist), od, rtol=1e-5, atol=1e-5)
    assert bool(res.converged)


def test_terrain_with_costs(terrain_mesh_medium):
    m = terrain_mesh_medium
    rng = np.random.default_rng(0)
    costs = rng.uniform(0.0, 0.8, m.num_vertices).astype(np.float32)
    res, od, _ = _solve_both(m, costs, seed=17, edge_cost_factor=1.0)
    np.testing.assert_allclose(np.asarray(res.dist), od, rtol=1e-4, atol=1e-4)


def test_cost_limit_blocks_propagation(grid_mesh_small):
    """A wall of vertices above the cost limit must not relay distance."""
    m = grid_mesh_small
    n = 8
    costs = np.zeros(m.num_vertices, np.float32)
    # wall at x == 3 except nothing passes
    for j in range(n):
        costs[3 * n + j] = 5.0
    res, od, _ = _solve_both(m, costs, seed=0, cost_limit=1.0)
    np.testing.assert_allclose(np.asarray(res.dist), od, rtol=1e-5, atol=1e-5)
    # vertices behind the wall are unreachable (x > 3)
    d = np.asarray(res.dist).reshape(n, n)
    assert np.isinf(d[5:]).all()
    # wall itself is reachable (relaxed INTO, never FROM: dijkstra.cpp:302)
    assert np.isfinite(d[3]).all()


def test_infinite_cost_edge_weights(grid_mesh_small):
    """Infinite vertex cost makes incident edges infinite (mesh_map.cpp:541)."""
    m = grid_mesh_small
    costs = np.zeros(m.num_vertices, np.float32)
    costs[9] = np.inf
    ew = sweeps.compute_edge_weights(m, jnp.asarray(costs), 1.0)
    edges = np.asarray(m.edges)
    touches = (edges == 9).any(axis=1)
    assert np.isinf(np.asarray(ew)[touches]).all()
    assert np.isfinite(np.asarray(ew)[~touches]).all()


def test_predecessors_form_shortest_tree(grid_mesh_small):
    m = grid_mesh_small
    costs = np.zeros(m.num_vertices, np.float32)
    res, od, _ = _solve_both(m, costs, seed=10)
    dist = np.asarray(res.dist)
    pred = np.asarray(res.pred)
    pos = np.asarray(m.vertices)
    for v in range(m.num_vertices):
        if v == 10:
            assert pred[v] == v
            continue
        p = pred[v]
        assert p != v
        w = np.linalg.norm(pos[v] - pos[p])
        np.testing.assert_allclose(dist[v], dist[p] + w, rtol=1e-5)


def test_path_extraction(grid_mesh_small):
    m = grid_mesh_small
    costs = np.zeros(m.num_vertices, np.float32)
    res, _, _ = _solve_both(m, costs, seed=63)  # goal at far corner
    path, valid = sweeps.extract_path(res.pred, jnp.int32(0), jnp.int32(63), 64)
    p = np.asarray(path)[np.asarray(valid)]
    assert p[0] == 0 and p[-1] == 63
    cost = sweeps.path_cost(m.vertices, path, valid)
    # 7 diagonal steps is the shortest monotone path: 7*sqrt(2)
    np.testing.assert_allclose(float(cost), 7 * np.sqrt(2), rtol=1e-5)


def test_vector_map(grid_mesh_small):
    m = grid_mesh_small
    costs = np.zeros(m.num_vertices, np.float32)
    res, _, _ = _solve_both(m, costs, seed=63)
    vm = np.asarray(sweeps.vector_map_from_predecessors(m, res.pred))
    assert np.allclose(np.linalg.norm(vm[:63], axis=1), 1.0, atol=1e-5)
    assert np.allclose(vm[63], 0.0)
    # directions point toward the goal corner (positive x+y half-space)
    assert (vm[:63, :2].sum(axis=1) > 0).all()


def test_batched_vmap(grid_mesh_small):
    m = grid_mesh_small
    costs = jnp.zeros(m.num_vertices, jnp.float32)
    ew = sweeps.compute_edge_weights(m, costs, 0.0)
    W = sweeps.slot_weights(m, ew, costs, 1.0)
    seeds = jnp.asarray([0, 7, 56, 63], jnp.int32)
    batched = jax.vmap(
        lambda s: sweeps.shortest_path_field(m, W, s).dist
    )(seeds)
    for i, s in enumerate([0, 7, 56, 63]):
        single = sweeps.shortest_path_field(m, W, jnp.int32(s)).dist
        np.testing.assert_allclose(np.asarray(batched[i]), np.asarray(single), rtol=1e-6)
