"""End-to-end planner tests: plan on a mesh, check outcome/path/cost against
the oracle and geometric ground truth."""

import numpy as np
import jax
import jax.numpy as jnp

from mesh_navigation_tpu.api.outcomes import Outcome
from mesh_navigation_tpu.config import PlannerConfig
from mesh_navigation_tpu.planners import DijkstraPlanner, CVPPlanner
from mesh_navigation_tpu.utils import oracle
from mesh_navigation_tpu.ops import sweeps


def test_dijkstra_plan_flat(grid_mesh_small):
    m = grid_mesh_small
    costs = jnp.zeros(m.num_vertices, jnp.float32)
    planner = DijkstraPlanner(m, max_path_len=32)
    W = planner.prepare_weights(costs)
    res = planner.plan_one(W, jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([7.0, 7.0, 0.0]))
    assert int(res.outcome) == Outcome.SUCCESS
    np.testing.assert_allclose(float(res.cost), 7 * np.sqrt(2), rtol=1e-5)
    # path starts at start vertex, ends at goal vertex
    valid = np.asarray(res.path_valid)
    pts = np.asarray(res.path_positions)[valid]
    np.testing.assert_allclose(pts[0], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(pts[-1], [7, 7, 0], atol=1e-6)
    # potential at start equals path cost (straight diagonal field)
    assert np.isfinite(np.asarray(res.potential)).all()


def test_dijkstra_path_cost_vs_oracle(terrain_mesh_medium):
    m = terrain_mesh_medium
    rng = np.random.default_rng(7)
    costs_np = rng.uniform(0.0, 0.6, m.num_vertices).astype(np.float32)
    costs = jnp.asarray(costs_np)
    planner = DijkstraPlanner(m, PlannerConfig(cost_limit=1.0), max_path_len=256)
    W = planner.prepare_weights(costs, edge_cost_factor=1.0)
    start = np.asarray(m.vertices[40])
    goal = np.asarray(m.vertices[990])
    res = planner.plan_one(W, jnp.asarray(start), jnp.asarray(goal))
    assert int(res.outcome) == Outcome.SUCCESS

    ew = sweeps.compute_edge_weights(m, costs, 1.0)
    od, _ = oracle.dijkstra_oracle(
        m.num_vertices, oracle.mesh_adjacency(m), np.asarray(ew), costs_np, 990
    )
    # potential field parity at the start vertex (BASELINE: within 1%)
    assert abs(float(res.potential[40]) - od[40]) / od[40] < 1e-4


def test_dijkstra_batch(grid_mesh_small):
    m = grid_mesh_small
    costs = jnp.zeros(m.num_vertices, jnp.float32)
    planner = DijkstraPlanner(m, max_path_len=32)
    W = planner.prepare_weights(costs)
    starts = jnp.asarray([[0.0, 0, 0], [7, 0, 0], [0, 7, 0], [3, 3, 0]])
    goals = jnp.asarray([[7.0, 7, 0], [0, 7, 0], [7, 0, 0], [5, 5, 0]])
    res = planner.plan_batch(W, starts, goals)
    assert res.outcome.shape == (4,)
    assert (np.asarray(res.outcome) == Outcome.SUCCESS).all()
    np.testing.assert_allclose(float(res.cost[0]), 7 * np.sqrt(2), rtol=1e-5)
    np.testing.assert_allclose(float(res.cost[3]), 2 * np.sqrt(2), rtol=1e-5)


def test_cvp_plan_flat(grid_mesh_small):
    m = grid_mesh_small
    costs = jnp.zeros(m.num_vertices, jnp.float32)
    planner = CVPPlanner(m, PlannerConfig(step_width=0.4), max_path_len=64)
    ew = planner.prepare_weights(costs)
    start = jnp.asarray([0.5, 0.5, 0.0])
    goal = jnp.asarray([6.5, 6.5, 0.0])
    res = planner.plan_one(ew, costs, start, goal)
    assert int(res.outcome) == Outcome.SUCCESS
    # near-straight diagonal: cost close to Euclidean distance, within a few %
    euclid = float(jnp.linalg.norm(goal - start))
    assert euclid <= float(res.cost) < euclid * 1.2
    # the potential at the start's nearest vertex approximates the geodesic
    pot = np.asarray(res.potential)
    assert np.isfinite(pot).sum() > 50


def test_cvp_field_points_to_goal(grid_mesh_small):
    m = grid_mesh_small
    costs = jnp.zeros(m.num_vertices, jnp.float32)
    planner = CVPPlanner(m)
    ew = planner.prepare_weights(costs)
    res = planner.plan_one(
        ew, costs, jnp.asarray([0.5, 0.5, 0.0]), jnp.asarray([6.5, 6.5, 0.0])
    )
    vm = np.asarray(res.vector_map)
    pos = np.asarray(m.vertices)
    goal = np.array([6.5, 6.5, 0.0])
    has = np.linalg.norm(vm, axis=1) > 0.5
    assert has.sum() > 40
    to_goal = goal - pos[has]
    to_goal /= np.maximum(np.linalg.norm(to_goal, axis=1, keepdims=True), 1e-9)
    cos = np.sum(vm[has] * to_goal, axis=1)
    # directions predominantly aligned with the goal direction
    assert np.median(cos) > 0.8


def test_cvp_invalid_goal(grid_mesh_small):
    m = grid_mesh_small
    costs = jnp.zeros(m.num_vertices, jnp.float32)
    planner = CVPPlanner(m)
    ew = planner.prepare_weights(costs)
    res = planner.plan_one(
        ew, costs, jnp.asarray([0.5, 0.5, 0.0]), jnp.asarray([50.0, 50.0, 0.0])
    )
    assert int(res.outcome) == Outcome.INVALID_GOAL
