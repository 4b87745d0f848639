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
    np.testing.assert_allclose(
        np.asarray(srv.offset_plan.planes),
        np.asarray(srv2.offset_plan.planes),
        rtol=1e-6,
    )

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
