"""Row-windowed incremental plane refresh vs the full refresh.

refresh_banded_planes_rows rewrites only the plane rows whose costs changed
(live-replan fast path); every field it produces must equal
refresh_banded_planes_from_costs on the new costs EXACTLY — including when
the change doesn't fit the slab (in-jit fallback) and at plane edges."""

import numpy as np
import jax
import jax.numpy as jnp

from mesh_navigation_tpu.mesh import build_mesh, reorder, synthetic
from mesh_navigation_tpu.ops import pallas_banded as pb
from mesh_navigation_tpu.ops import sweeps


_CMP = ("down", "up", "a_fwd", "a_bwd", "res_w", "lat_fwd", "lat_bwd",
        "xdown", "xup", "l2_fwd", "l2_bwd", "wback_fwd", "wback_bwd")


def _plan_for(mesh, costs):
    W = sweeps.slot_weights_np(mesh, costs, cost_limit=2.0,
                               edge_cost_factor=1.0)
    return pb.build_banded_kernel_plan(mesh, W)


def _check(mesh, costs0, costs1, row_window):
    plan_raw = _plan_for(mesh, costs0)
    base = pb.refresh_banded_planes_from_costs(
        plan_raw, jnp.asarray(costs0), edge_cost_factor=1.0, cost_limit=2.0
    )
    want = pb.refresh_banded_planes_from_costs(
        plan_raw, jnp.asarray(costs1), edge_cost_factor=1.0, cost_limit=2.0
    )
    got = jax.jit(
        lambda bp, c0, c1: pb.refresh_banded_planes_rows(
            bp, c0, c1, edge_cost_factor=1.0, cost_limit=2.0,
            row_window=row_window,
        )
    )(base, jnp.asarray(costs0), jnp.asarray(costs1))
    for name in _CMP:
        w, g = getattr(want, name), getattr(got, name)
        if w is None:
            assert g is None, name
            continue
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(w), err_msg=name
        )


def _grid(rows=64, cols=24, seed=0):
    v, f = synthetic.terrain_mesh(rows, cols, spacing=0.5, hills=1.0,
                                  roughness=0.02, seed=seed)
    return build_mesh(v, f)


def test_rows_local_disc():
    mesh = _grid()
    rng = np.random.default_rng(0)
    costs0 = rng.uniform(0.0, 0.5, mesh.num_vertices).astype(np.float32)
    costs1 = costs0.copy()
    centre = 30 * 24 + 10
    costs1[centre - 24:centre + 25] = np.inf       # ~3-row lethal disc
    _check(mesh, costs0, costs1, row_window=16)


def test_rows_fallback_wide_change():
    mesh = _grid(seed=1)
    rng = np.random.default_rng(1)
    costs0 = rng.uniform(0.0, 0.5, mesh.num_vertices).astype(np.float32)
    costs1 = costs0 * 1.5 + 0.1                    # every row changes
    _check(mesh, costs0, costs1, row_window=16)


def test_rows_at_plane_edges():
    mesh = _grid(seed=2)
    costs0 = np.zeros(mesh.num_vertices, np.float32)
    top = costs0.copy()
    top[:30] = 1.0                                  # rows 0-1
    _check(mesh, costs0, top, row_window=16)
    bot = costs0.copy()
    bot[-30:] = 1.0                                 # last rows
    _check(mesh, costs0, bot, row_window=16)


def test_rows_no_change():
    mesh = _grid(seed=3)
    costs0 = np.full(mesh.num_vertices, 0.25, np.float32)
    _check(mesh, costs0, costs0.copy(), row_window=16)


def test_rows_irregular_with_residuals():
    v, f = synthetic.irregular_terrain_mesh(
        48, 20, spacing=0.5, jitter=0.4, hills=1.0, roughness=0.02, seed=5
    )
    mesh = reorder.build_reordered_mesh(v, f)
    rng = np.random.default_rng(5)
    costs0 = rng.uniform(0.0, 0.5, mesh.num_vertices).astype(np.float32)
    costs1 = costs0.copy()
    centre = mesh.num_vertices // 2
    costs1[centre - 20:centre + 20] = np.inf
    _check(mesh, costs0, costs1, row_window=16)
