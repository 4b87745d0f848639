"""Batched [V,B] eikonal solver parity with the per-scenario solver."""

import numpy as np
import jax.numpy as jnp

from mesh_navigation_tpu.ops import eikonal, sweeps


def test_batched_matches_single(terrain_mesh_medium):
    m = terrain_mesh_medium
    rng = np.random.default_rng(1)
    costs = jnp.asarray(rng.uniform(0, 0.5, m.num_vertices).astype(np.float32))
    ew = sweeps.compute_edge_weights(m, costs, 1.0)
    tmask = costs < 1.0
    goals = [100, 500, 900]
    seeds = np.full((len(goals), m.num_vertices), np.inf, np.float32)
    for i, g in enumerate(goals):
        seeds[i, g] = 0.0
    res = eikonal.batched_eikonal_field(
        m, ew, jnp.asarray(seeds), update="unfolding", target_mask=tmask
    )
    assert bool(res.converged)
    for i, g in enumerate(goals):
        single = eikonal.eikonal_field(
            m, ew, jnp.asarray(seeds[i]), update="unfolding", target_mask=tmask
        )
        ours = np.asarray(res.dist[i])
        ref = np.asarray(single.dist)
        fin = np.isfinite(ref)
        assert (np.isfinite(ours) == fin).all()
        np.testing.assert_allclose(ours[fin], ref[fin], rtol=1e-5, atol=1e-5)
        # predecessors point downhill
        pred = np.asarray(res.pred[i])
        d = ours
        has = (pred != np.arange(m.num_vertices)) & np.isfinite(d)
        assert (d[pred[has]] <= d[has] + 1e-5).all()


def test_cvp_plan_batch_matches_plan_one(grid_mesh_small):
    from mesh_navigation_tpu.api.outcomes import Outcome
    from mesh_navigation_tpu.config import PlannerConfig
    from mesh_navigation_tpu.planners import CVPPlanner

    m = grid_mesh_small
    costs = jnp.zeros(m.num_vertices, jnp.float32)
    planner = CVPPlanner(m, PlannerConfig(step_width=0.4), max_path_len=64)
    ew = planner.prepare_weights(costs)
    starts = jnp.asarray([[0.5, 0.5, 0.0], [6.5, 0.5, 0.0]])
    goals = jnp.asarray([[6.5, 6.5, 0.0], [0.5, 6.5, 0.0]])
    rb = planner.plan_batch(ew, costs, starts, goals)
    assert (np.asarray(rb.outcome) == Outcome.SUCCESS).all()
    for i in range(2):
        r1 = planner.plan_one(ew, costs, starts[i], goals[i])
        np.testing.assert_allclose(float(rb.cost[i]), float(r1.cost), rtol=1e-4)
        fin = np.isfinite(np.asarray(r1.potential))
        np.testing.assert_allclose(
            np.asarray(rb.potential[i])[fin], np.asarray(r1.potential)[fin], rtol=1e-5
        )
