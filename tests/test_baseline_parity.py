"""The BASELINE acceptance criterion, end-to-end: batched TPU-style solves
vs the native C++ heap-Dijkstra baseline on the same mesh — path cost within
1% (BASELINE.md), potentials exact."""

import numpy as np
import jax.numpy as jnp
import pytest

from mesh_navigation_tpu.config import PlannerConfig
from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.ops import sweeps
from mesh_navigation_tpu.planners import DijkstraPlanner

native = pytest.importorskip("mesh_navigation_tpu.native")


@pytest.mark.parametrize("solver", ["batched", "structured"])
def test_path_cost_within_one_percent(solver):
    if not native.available():
        pytest.skip("no native toolchain")
    v, f = synthetic.terrain_mesh(48, 48, spacing=0.5, hills=2.0, roughness=0.03, seed=11)
    mesh = build_mesh(v, f)
    rng = np.random.default_rng(0)
    costs_np = rng.uniform(0.0, 0.7, mesh.num_vertices).astype(np.float32)
    costs = jnp.asarray(costs_np)

    planner = DijkstraPlanner(mesh, PlannerConfig(cost_limit=1.0), max_path_len=256)
    W = planner.prepare_weights(costs, edge_cost_factor=1.0)
    ew = np.asarray(sweeps.compute_edge_weights(mesh, costs, 1.0))

    pos = np.asarray(mesh.vertices)
    starts_v = [3, 700, 1500]
    goals_v = [2200, 900, 100]
    starts = jnp.asarray(pos[starts_v])
    goals = jnp.asarray(pos[goals_v])

    if solver == "structured":
        plan = planner.prepare_offset_plan(W)
        res = planner.plan_batch_structured(W, plan, starts, goals)
    else:
        res = planner.plan_batch(W, starts, goals)

    nm = native.NativeMesh(pos, np.asarray(mesh.faces))
    for i, (sv, gv) in enumerate(zip(starts_v, goals_v)):
        # native heap Dijkstra seeded at the goal (the reference's seeding)
        nd, npred = nm.dijkstra(ew, costs_np, gv, 1.0)
        # potentials: exact fixed-point equality
        ours = np.asarray(res.potential[i])
        fin = np.isfinite(nd)
        assert (np.isfinite(ours) == fin).all()
        np.testing.assert_allclose(ours[fin], nd[fin], rtol=1e-4, atol=1e-4)
        # path cost: walk the native predecessor chain, compare Euclidean
        # chain lengths (the planner's cost metric) within 1%
        chain = [sv]
        while chain[-1] != gv and len(chain) < 10000:
            chain.append(int(npred[chain[-1]]))
        ref_cost = float(
            np.linalg.norm(np.diff(pos[chain], axis=0), axis=1).sum()
        )
        got = float(res.cost[i])
        assert abs(got - ref_cost) / ref_cost < 0.01, (got, ref_cost)
