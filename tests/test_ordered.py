"""Ordered fast-sweeping solver: exact fixed-point parity with the Jacobi
solver (and hence with heap Dijkstra)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mesh_navigation_tpu.ops import sweeps, ordered


@pytest.mark.parametrize("directions", [4, 8])
def test_ordered_matches_jacobi(terrain_mesh_medium, directions):
    m = terrain_mesh_medium
    rng = np.random.default_rng(0)
    costs = jnp.asarray(rng.uniform(0, 0.8, m.num_vertices).astype(np.float32))
    ew = sweeps.compute_edge_weights(m, costs, 1.0)
    W = sweeps.slot_weights(m, ew, costs, 1.0)
    plan = ordered.build_sweep_plan(m, directions=directions)
    seeds = jnp.asarray([0, 99, 512], jnp.int32)
    res = ordered.batched_field_ordered(m, W, plan, seeds)
    assert bool(res.converged)
    for i, s in enumerate([0, 99, 512]):
        ref = sweeps.shortest_path_field(m, W, jnp.int32(s)).dist
        fin = np.isfinite(np.asarray(ref))
        err = np.abs(np.asarray(res.dist[i]) - np.asarray(ref))
        assert err[fin].max() < 1e-5
        assert (np.isfinite(np.asarray(res.dist[i])) == fin).all()


def test_ordered_pred_consistent(grid_mesh_small):
    m = grid_mesh_small
    costs = jnp.zeros(m.num_vertices, jnp.float32)
    ew = sweeps.compute_edge_weights(m, costs, 0.0)
    W = sweeps.slot_weights(m, ew, costs, 1.0)
    plan = ordered.build_sweep_plan(m)
    res = ordered.batched_field_ordered(m, W, plan, jnp.asarray([63], jnp.int32))
    d = np.asarray(res.dist[0])
    pred = np.asarray(res.pred[0])
    pos = np.asarray(m.vertices)
    for v in range(m.num_vertices):
        if v == 63:
            assert pred[v] == v
            continue
        p = pred[v]
        assert p != v
        np.testing.assert_allclose(
            d[v], d[p] + np.linalg.norm(pos[v] - pos[p]), rtol=1e-4
        )


def test_planner_batch_ordered(grid_mesh_small):
    from mesh_navigation_tpu.api.outcomes import Outcome
    from mesh_navigation_tpu.config import PlannerConfig
    from mesh_navigation_tpu.planners import DijkstraPlanner

    m = grid_mesh_small
    costs = jnp.zeros(m.num_vertices, jnp.float32)
    p_ord = DijkstraPlanner(m, PlannerConfig(method="batched", ordered_rounds=2), max_path_len=32)
    p_jac = DijkstraPlanner(m, PlannerConfig(method="jacobi"), max_path_len=32)
    W = p_ord.prepare_weights(costs)
    starts = jnp.asarray([[0.0, 0, 0], [7, 0, 0], [3, 3, 0]])
    goals = jnp.asarray([[7.0, 7, 0], [0, 7, 0], [5, 5, 0]])
    r1 = p_ord.plan_batch(W, starts, goals)
    r2 = p_jac.plan_batch(W, starts, goals)
    assert (np.asarray(r1.outcome) == Outcome.SUCCESS).all()
    np.testing.assert_allclose(np.asarray(r1.cost), np.asarray(r2.cost), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(r1.potential), np.asarray(r2.potential), rtol=1e-5
    )


def test_planner_batch_structured(grid_mesh_small):
    from mesh_navigation_tpu.api.outcomes import Outcome
    from mesh_navigation_tpu.config import PlannerConfig
    from mesh_navigation_tpu.planners import DijkstraPlanner

    m = grid_mesh_small
    costs = jnp.zeros(m.num_vertices, jnp.float32)
    planner = DijkstraPlanner(m, PlannerConfig(), max_path_len=32)
    W = planner.prepare_weights(costs)
    plan = planner.prepare_offset_plan(W)
    starts = jnp.asarray([[0.0, 0, 0], [7, 0, 0]])
    goals = jnp.asarray([[7.0, 7, 0], [0, 7, 0]])
    r1 = planner.plan_batch_structured(W, plan, starts, goals)
    r2 = planner.plan_batch(W, starts, goals)
    assert (np.asarray(r1.outcome) == Outcome.SUCCESS).all()
    np.testing.assert_allclose(np.asarray(r1.cost), np.asarray(r2.cost), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r1.potential), np.asarray(r2.potential), rtol=1e-5)


def test_structured_bf16_within_tolerance(terrain_mesh_medium):
    from mesh_navigation_tpu.ops import structured

    m = terrain_mesh_medium
    rng = np.random.default_rng(0)
    costs = jnp.asarray(rng.uniform(0, 0.6, m.num_vertices).astype(np.float32))
    ew = sweeps.compute_edge_weights(m, costs, 1.0)
    W = sweeps.slot_weights(m, ew, costs, 1.0)
    plan = structured.build_offset_plan(m, W)
    seeds = jnp.asarray([3, 512], jnp.int32)
    r32 = structured.batched_field_structured(m, W, plan, seeds, use_pallas=False)
    r16 = structured.batched_field_structured(
        m, W, plan, seeds, use_pallas=False, dtype=jnp.bfloat16
    )
    a, b = np.asarray(r32.dist), np.asarray(r16.dist)
    fin = np.isfinite(a)
    assert (np.isfinite(b) == fin).all()
    rel = np.abs(b[fin] - a[fin]) / np.maximum(a[fin], 0.5)
    # opt-in approximate mode: bf16 rounding accumulates to ~1.5% worst case
    assert rel.max() < 0.02, rel.max()
    assert rel.mean() < 0.005, rel.mean()
