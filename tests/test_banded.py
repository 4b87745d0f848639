"""Banded GS solver (min-plus scan fast sweeping) vs Dijkstra oracle —
exact fixed-point parity, including obstacle walls and cost limits."""

import numpy as np
import jax.numpy as jnp

from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.ops import banded, sweeps
from mesh_navigation_tpu.utils import oracle


def _weights(mesh, costs, cost_limit=1.0, edge_cost_factor=1.0):
    ew = sweeps.compute_edge_weights(mesh, jnp.asarray(costs), edge_cost_factor)
    W = sweeps.slot_weights(mesh, ew, jnp.asarray(costs), cost_limit)
    return ew, W


def _oracle(mesh, ew, costs, seed, cost_limit=1.0):
    adj = oracle.mesh_adjacency(mesh)
    od, _ = oracle.dijkstra_oracle(
        mesh.num_vertices, adj, np.asarray(ew), np.asarray(costs), seed, cost_limit
    )
    return od


def test_band_width_inference(terrain_mesh_medium):
    assert banded.infer_band_width(terrain_mesh_medium) == 32


def test_plan_coverage_grid(terrain_mesh_medium):
    m = terrain_mesh_medium
    costs = np.zeros(m.num_vertices, np.float32)
    _, W = _weights(m, costs)
    plan = banded.build_banded_plan(m, W)
    # terrain grid: every edge is one of the six banded classes
    assert plan.coverage == 1.0
    assert plan.n_cols == 32


def test_flat_grid_exact(grid_mesh_small):
    m = grid_mesh_small
    costs = np.zeros(m.num_vertices, np.float32)
    ew, W = _weights(m, costs, edge_cost_factor=0.0)
    plan = banded.build_banded_plan(m, W)
    seeds = jnp.asarray([0, 37, 63], jnp.int32)
    res = banded.batched_field_banded(m, W, plan, seeds)
    assert bool(res.converged)
    for b, s in enumerate([0, 37, 63]):
        od = _oracle(m, ew, costs, s)
        np.testing.assert_allclose(np.asarray(res.dist[b]), od, rtol=1e-5, atol=1e-5)


def test_terrain_costs_exact(terrain_mesh_medium):
    m = terrain_mesh_medium
    rng = np.random.default_rng(1)
    costs = rng.uniform(0.0, 0.8, m.num_vertices).astype(np.float32)
    ew, W = _weights(m, costs)
    plan = banded.build_banded_plan(m, W)
    seeds = jnp.asarray([17, 500, 1000, 40], jnp.int32)
    res = banded.batched_field_banded(m, W, plan, seeds)
    assert bool(res.converged)
    for b, s in enumerate([17, 500, 1000, 40]):
        od = _oracle(m, ew, costs, s)
        np.testing.assert_allclose(np.asarray(res.dist[b]), od, rtol=1e-4, atol=1e-4)


def test_obstacle_maze_exact():
    """Winding characteristics: walls force multi-round convergence; the
    fixed point must still equal Dijkstra exactly."""
    n = 24
    v, f = synthetic.terrain_mesh(n, n, spacing=0.5, hills=1.0, seed=2)
    m = build_mesh(v, f)
    costs = np.zeros(m.num_vertices, np.float32)
    # two offset walls with gaps -> S-shaped optimal paths
    costs[np.arange(8 * n, 8 * n + n - 6)] = np.inf     # wall row 8, gap right
    costs[np.arange(16 * n + 6, 17 * n)] = np.inf        # wall row 16, gap left
    ew, W = _weights(m, costs, cost_limit=1.0)
    plan = banded.build_banded_plan(m, W)
    seeds = jnp.asarray([0, n * n - 1], jnp.int32)
    res = banded.batched_field_banded(m, W, plan, seeds)
    assert bool(res.converged)
    for b, s in enumerate([0, n * n - 1]):
        od = _oracle(m, ew, costs, s)
        np.testing.assert_allclose(np.asarray(res.dist[b]), od, rtol=1e-4, atol=1e-4)


def test_predecessors_reconstruct(terrain_mesh_medium):
    m = terrain_mesh_medium
    costs = np.zeros(m.num_vertices, np.float32)
    ew, W = _weights(m, costs, edge_cost_factor=0.0)
    plan = banded.build_banded_plan(m, W)
    res = banded.batched_field_banded(m, W, plan, jnp.asarray([100], jnp.int32))
    dist = np.asarray(res.dist[0])
    pred = np.asarray(res.pred[0])
    Wn = np.asarray(W)
    adjn = np.asarray(m.adj_vertex)
    for v in range(m.num_vertices):
        if v == 100:
            assert pred[v] == v
            continue
        if not np.isfinite(dist[v]):
            continue
        p = pred[v]
        slot = np.where(adjn[v] == p)[0]
        assert slot.size
        np.testing.assert_allclose(
            dist[v], dist[p] + Wn[v, slot].min(), rtol=1e-5, atol=1e-5
        )
