"""Live-replan path (§3.5 cascade): update_point_cloud must refresh the
banded/offset solver plans ON DEVICE and produce exactly the plans a full
host rebuild would — and the subsequent plan must route around the new
obstacle."""

import numpy as np
import jax.numpy as jnp

from mesh_navigation_tpu.api.outcomes import Outcome
from mesh_navigation_tpu.api.server import MeshNavServer
from mesh_navigation_tpu.config import (
    LayerConfig, MeshMapConfig, NavConfig, PlannerConfig,
)
from mesh_navigation_tpu.mesh import build_mesh, synthetic


def _server():
    v, f = synthetic.terrain_mesh(20, 20, spacing=0.5, hills=0.5, seed=2)
    mesh = build_mesh(v, f)
    cfg = NavConfig(
        mesh_map=MeshMapConfig(default_layer="combined"),
        planner=PlannerConfig(method="batched", ordered_rounds=0, cost_limit=2.0),
        layers=(
            LayerConfig(name="steep", kind="steepness"),
            LayerConfig(name="obst", kind="obstacle"),
            LayerConfig(
                name="combined", kind="max_combination", inputs=("steep", "obst")
            ),
        ),
    )
    return MeshNavServer(mesh, cfg, planner_kind="dijkstra", max_path_len=128)


def test_update_point_cloud_refreshes_plans_on_device():
    srv = _server()
    plan0 = srv.banded_plan
    assert plan0 is not None
    # drop an obstacle wall of sensor points across the middle
    xs = np.linspace(0.5, 9.0, 40, dtype=np.float32)
    pts = np.stack([xs, np.full_like(xs, 5.0), np.full_like(xs, 0.3)], axis=1)
    srv.update_point_cloud("obst", jnp.asarray(pts))

    # hot path must NOT rebuild the classification (same static structure)
    assert srv.banded_plan.n_residual == plan0.n_residual
    assert srv.banded_plan.coverage == plan0.coverage

    # planes must equal a full structural rebuild with the same state
    srv2 = _server()
    srv2.layer_state["obstacle:obst:points"] = jnp.asarray(pts)
    srv2._refresh_costs(structural=True)
    srv2.layer_state.pop("obstacle:obst:points")
    for name in ("down", "up", "a_fwd", "a_bwd", "res_w"):
        np.testing.assert_allclose(
            np.asarray(getattr(srv.banded_plan, name)),
            np.asarray(getattr(srv2.banded_plan, name)),
            rtol=1e-6, atol=0.0, err_msg=name,
        )
    # offset plan is the banded plan's fallback and is no longer built
    # when a banded plan exists (r4: saves the second ~tens-of-seconds host
    # classification at 1M)
    assert srv.offset_plan is None and srv2.offset_plan is None

    # and a plan through the wall region reports lethal-aware routing
    res = srv.get_path_batch(
        jnp.asarray([[1.0, 1.0, 0.0]], jnp.float32),
        jnp.asarray([[8.0, 8.0, 0.0]], jnp.float32),
    )
    assert int(res.outcome[0]) in (Outcome.SUCCESS, Outcome.NO_PATH_FOUND)
    # clear_mesh restores the unobstructed plans
    srv.clear_mesh()
    res2 = srv.get_path_batch(
        jnp.asarray([[1.0, 1.0, 0.0]], jnp.float32),
        jnp.asarray([[8.0, 8.0, 0.0]], jnp.float32),
    )
    assert int(res2.outcome[0]) == Outcome.SUCCESS


def test_make_replan_step_cascade():
    """Full §3.5 cascade in one jit (points -> obstacle -> inflation ->
    combination -> plane refresh -> warm incremental solve): chained steps
    must match the server's stateful update path + a cold solve."""
    import numpy as np
    import jax.numpy as jnp

    from mesh_navigation_tpu.config import (
        LayerConfig, MeshMapConfig, NavConfig, PlannerConfig,
    )
    from mesh_navigation_tpu.api.server import MeshNavServer
    from mesh_navigation_tpu.mesh import build_mesh, synthetic
    from mesh_navigation_tpu.ops import pallas_banded as pb

    v, f = synthetic.terrain_mesh(16, 16, spacing=0.5, hills=1.0,
                                  roughness=0.02, seed=4)
    mesh = build_mesh(v, f)
    cfg = NavConfig(
        mesh_map=MeshMapConfig(default_layer="combine", edge_cost_factor=1.0),
        planner=PlannerConfig(cost_limit=2.0),
        layers=(
            LayerConfig(name="steep", kind="steepness", params=(("threshold", 2.0),)),
            LayerConfig(name="obst", kind="obstacle"),
            LayerConfig(name="infl", kind="inflation", inputs=("obst",),
                        params=(("repulsive_field", 0.0),)),
            LayerConfig(name="combine", kind="max_combination",
                        inputs=("steep", "obst", "infl")),
        ),
    )
    srv = MeshNavServer(mesh, cfg, planner_kind="dijkstra", max_path_len=128)
    assert srv.banded_plan is not None
    step = srv.make_replan_step("obst")

    seeds = jnp.asarray([10, 100], jnp.int32)
    base = pb.banded_solve_padded(
        srv.banded_plan, seeds, atol=1e-4, rtol=1e-3
    )
    pts1 = jnp.asarray([[3.0, 3.0, 0.5], [3.5, 3.0, 0.5]], jnp.float32)
    c1, d1, r1 = step(pts1, srv.vertex_costs, base.d_pad, seeds)
    # reference: the stateful server path with the same cloud
    srv.update_point_cloud("obst", pts1)
    np.testing.assert_allclose(
        np.asarray(c1), np.asarray(srv.vertex_costs), rtol=1e-6, atol=1e-6
    )
    cold = pb.banded_solve_padded(
        srv.banded_plan, seeds, atol=1e-4, rtol=1e-3
    )
    fin = np.isfinite(np.asarray(cold.d_pad))
    np.testing.assert_allclose(
        np.asarray(d1)[fin], np.asarray(cold.d_pad)[fin], rtol=5e-3, atol=1e-3
    )
    # chain a second, different cloud from the first step's outputs
    pts2 = jnp.asarray([[1.0, 5.0, 0.5]], jnp.float32)
    c2, d2, r2 = step(pts2, c1, d1, seeds)
    srv2 = MeshNavServer(mesh, cfg, planner_kind="dijkstra", max_path_len=128)
    srv2.update_point_cloud("obst", pts2)
    np.testing.assert_allclose(
        np.asarray(c2), np.asarray(srv2.vertex_costs), rtol=1e-6, atol=1e-6
    )
    cold2 = pb.banded_solve_padded(
        srv2.banded_plan, seeds, atol=1e-4, rtol=1e-3
    )
    fin2 = np.isfinite(np.asarray(cold2.d_pad))
    np.testing.assert_allclose(
        np.asarray(d2)[fin2], np.asarray(cold2.d_pad)[fin2], rtol=5e-3, atol=1e-3
    )
