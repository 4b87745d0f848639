"""Pallas banded GS kernel vs Dijkstra oracle (interpret mode on CPU) —
fixed-point parity, pred validity, and agreement with the scan solver.

Meshes are deliberately tiny: interpret-mode Pallas compiles slowly, and the
kernel unrolls row blocks."""

import numpy as np
import jax.numpy as jnp

from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.ops import banded, pallas_banded, sweeps
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


def _terrain16():
    v, f = synthetic.terrain_mesh(16, 16, spacing=0.5, hills=1.5, roughness=0.02, seed=3)
    return build_mesh(v, f)


def test_chain_weights_match_scan():
    """Precomputed A_k chains must equal k-fold composition of the lateral
    planes (spot-check k=2, fwd)."""
    m = _terrain16()
    costs = np.zeros(m.num_vertices, np.float32)
    _, W = _weights(m, costs)
    kp = pallas_banded.build_banded_kernel_plan(m, W)
    base = banded.build_banded_plan(m, W)
    lat = np.asarray(base.lat_fwd)
    a1 = np.asarray(kp.a_fwd[:, 0, :])[:, : base.n_cols]
    np.testing.assert_allclose(a1, lat)
    a2 = np.asarray(kp.a_fwd[:, 1, :])[:, : base.n_cols]
    expect = np.full_like(lat, np.inf)
    expect[:, 2:] = lat[:, 1:-1] + lat[:, 2:]
    np.testing.assert_allclose(a2, expect)


def test_flat_grid_exact(grid_mesh_small):
    m = grid_mesh_small
    costs = np.zeros(m.num_vertices, np.float32)
    ew, W = _weights(m, costs, edge_cost_factor=0.0)
    plan = pallas_banded.build_banded_kernel_plan(m, W)
    seeds = jnp.asarray([0, 37, 63], jnp.int32)
    res = pallas_banded.batched_field_banded_pallas(m, W, plan, seeds)
    assert bool(res.converged)
    for b, s in enumerate([0, 37, 63]):
        od = _oracle(m, ew, costs, s)
        np.testing.assert_allclose(np.asarray(res.dist[b]), od, rtol=1e-4, atol=1e-4)


def test_terrain_parity_and_pred_validity():
    m = _terrain16()
    rng = np.random.default_rng(1)
    costs = rng.uniform(0.0, 0.8, m.num_vertices).astype(np.float32)
    ew, W = _weights(m, costs)
    kplan = pallas_banded.build_banded_kernel_plan(m, W)
    seeds_l = [17, 100, 255, 40]
    res = pallas_banded.batched_field_banded_pallas(
        m, W, kplan, jnp.asarray(seeds_l, jnp.int32)
    )
    assert bool(res.converged)
    Wn = np.asarray(W)
    adjn = np.asarray(m.adj_vertex)
    for b, s in enumerate(seeds_l):
        od = _oracle(m, ew, costs, s)
        got = np.asarray(res.dist[b])
        np.testing.assert_allclose(got, od, rtol=1e-3, atol=1e-4)
        # predecessor validity: dist[pred] + w(pred, v) == dist[v]
        pred = np.asarray(res.pred[b])
        for v in range(m.num_vertices):
            if not np.isfinite(got[v]) or v == s:
                continue
            p = pred[v]
            assert p != v, f"vertex {v} has self pred but finite dist"
            slots = np.nonzero(adjn[v] == p)[0]
            w = Wn[v, slots].min()
            assert abs(got[p] + w - got[v]) < 1e-3
        assert pred[s] == s


def test_obstacle_maze_exact():
    """Walls force multi-round convergence; unreachable side must stay inf."""
    n = 24
    v, f = synthetic.terrain_mesh(n, n, spacing=0.5, hills=1.0, seed=2)
    m = build_mesh(v, f)
    costs = np.zeros(m.num_vertices, np.float32)
    costs[np.arange(8 * n, 8 * n + n - 6)] = np.inf
    costs[np.arange(16 * n + 6, 17 * n)] = np.inf
    ew, W = _weights(m, costs, cost_limit=1.0)
    plan = pallas_banded.build_banded_kernel_plan(m, W)
    seeds = jnp.asarray([0, n * n - 1], jnp.int32)
    res = pallas_banded.batched_field_banded_pallas(m, W, plan, seeds)
    assert bool(res.converged)
    for b, s in enumerate([0, n * n - 1]):
        od = _oracle(m, ew, costs, s, 1.0)
        got = np.asarray(res.dist[b])
        fin = np.isfinite(od)
        assert np.array_equal(fin, np.isfinite(got))
        np.testing.assert_allclose(got[fin], od[fin], rtol=1e-3, atol=1e-4)


def test_truncated_scan_same_fixed_point():
    """Scan depth is a speed knob, not a correctness knob: depth 2 must reach
    the same fixed point (in more rounds)."""
    m = _terrain16()
    costs = np.zeros(m.num_vertices, np.float32)
    ew, W = _weights(m, costs)
    plan = pallas_banded.build_banded_kernel_plan(m, W, n_scan=2)
    assert plan.n_scan == 2
    seeds = jnp.asarray([17, 200], jnp.int32)
    res = pallas_banded.batched_field_banded_pallas(m, W, plan, seeds)
    assert bool(res.converged)
    for b, s in enumerate([17, 200]):
        od = _oracle(m, ew, costs, s)
        np.testing.assert_allclose(np.asarray(res.dist[b]), od, rtol=1e-3, atol=1e-4)


def test_refresh_planes_matches_host_rebuild():
    """refresh_banded_planes (device, jittable) must reproduce exactly what a
    host rebuild with the new weights produces — the live-replan contract."""
    import jax

    m = _terrain16()
    rng = np.random.default_rng(7)
    costs1 = rng.uniform(0.0, 0.5, m.num_vertices).astype(np.float32)
    costs2 = rng.uniform(0.0, 0.9, m.num_vertices).astype(np.float32)
    costs2[40:60] = np.inf  # lethal patch: planes must carry inf through
    _, W1 = _weights(m, costs1)
    _, W2 = _weights(m, costs2)
    plan1 = pallas_banded.build_banded_kernel_plan(m, W1)
    plan2 = pallas_banded.build_banded_kernel_plan(m, W2)
    refreshed = jax.jit(pallas_banded.refresh_banded_planes)(plan1, jnp.asarray(W2))
    for name in ("down", "up", "a_fwd", "a_bwd", "res_w"):
        np.testing.assert_allclose(
            np.asarray(getattr(refreshed, name)),
            np.asarray(getattr(plan2, name)),
            rtol=1e-6, atol=0.0,
            err_msg=name,
        )


def test_plan_batch_banded_light_matches_full():
    """light=True must agree on path/cost/outcome and skip the vector field."""
    from mesh_navigation_tpu.config import PlannerConfig
    from mesh_navigation_tpu.planners import DijkstraPlanner

    m = _terrain16()
    costs = np.zeros(m.num_vertices, np.float32)
    _, W = _weights(m, costs)
    planner = DijkstraPlanner(
        m, PlannerConfig(method="batched", ordered_rounds=0), max_path_len=128
    )
    kplan = planner.prepare_banded_plan(np.asarray(W))
    assert kplan is not None
    starts = jnp.asarray([[1.0, 1.0, 0.0], [5.0, 2.0, 0.0]], jnp.float32)
    goals = jnp.asarray([[6.0, 6.0, 0.0], [1.5, 6.5, 0.0]], jnp.float32)
    full = planner.plan_batch_banded(W, kplan, starts, goals)
    light = planner.plan_batch_banded(W, kplan, starts, goals, light=True)
    assert light.vector_map is None and full.vector_map is not None
    np.testing.assert_array_equal(np.asarray(full.outcome), np.asarray(light.outcome))
    np.testing.assert_allclose(np.asarray(full.cost), np.asarray(light.cost), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(full.path_valid), np.asarray(light.path_valid)
    )


def test_class_pred_table_matches_int32():
    """int8 class pred (predecessors_banded_classes + delta decode) must
    reproduce the int32 id table exactly, and extract_paths_cls must walk
    the same paths as extract_paths_vb."""
    m = _terrain16()
    costs = np.asarray(
        0.1 * np.sin(np.arange(m.num_vertices)) ** 2, np.float32
    )
    _, W = _weights(m, costs)
    plan = pallas_banded.build_banded_kernel_plan(m, np.asarray(W))
    assert plan.n_residual == 0
    seeds = jnp.asarray([5, 200], jnp.int32)
    res = pallas_banded.banded_solve_padded(plan, seeds)
    pred32 = np.asarray(
        pallas_banded.predecessors_banded_pallas(plan, res.d_pad)[:, :2]
    )
    cls = np.asarray(
        pallas_banded.predecessors_banded_classes(plan, res.d_pad)[:, :2]
    )
    C = plan.n_cols
    delta = np.asarray([-1, 1, -C - 1, -C, -C + 1, C - 1, C, C + 1, 0])
    decoded = np.arange(m.num_vertices)[:, None] + delta[cls]
    np.testing.assert_array_equal(decoded, pred32)

    starts = jnp.asarray([250, 17], jnp.int32)
    p32, v32 = pallas_banded.extract_paths_vb(
        jnp.asarray(pred32), starts, seeds, 64
    )
    pc, vc = pallas_banded.extract_paths_cls(
        jnp.asarray(cls), starts, seeds, 64, C
    )
    np.testing.assert_array_equal(np.asarray(p32), np.asarray(pc))
    np.testing.assert_array_equal(np.asarray(v32), np.asarray(vc))


def test_controller_lane_minor_matches():
    """compute_velocity_banded on the solver-native [V, B] field (+ lane
    remap) must emit identical commands to the [B, V] potential path."""
    from mesh_navigation_tpu.config import ControllerConfig, PlannerConfig
    from mesh_navigation_tpu.control import MeshController
    from mesh_navigation_tpu.control.controller import initial_state
    from mesh_navigation_tpu.planners import DijkstraPlanner

    m = _terrain16()
    costs = np.zeros(m.num_vertices, np.float32)
    _, W = _weights(m, costs)
    planner = DijkstraPlanner(
        m, PlannerConfig(method="batched", ordered_rounds=0), max_path_len=128
    )
    kplan = planner.prepare_banded_plan(np.asarray(W))
    ctrl = MeshController(m, ControllerConfig(), grid=planner.grid)
    starts = jnp.asarray([[1.0, 1.0, 0.0], [5.0, 2.0, 0.0]], jnp.float32)
    # reversed goal order so the sorted-lane permutation is non-trivial
    goals = jnp.asarray([[6.0, 6.0, 0.0], [1.5, 6.5, 0.0]], jnp.float32)
    res = planner.plan_batch_banded(W, kplan, starts, goals, light=True)
    import jax

    quats = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (2, 1))
    st = jax.vmap(
        lambda g: initial_state(g, jnp.asarray([1.0, 0.0, 0.0]))
    )(goals)
    cmd_bv, _ = ctrl.compute_velocity_banded(
        kplan, res.potential, jnp.asarray(costs), starts, quats, st
    )
    cmd_vb, _ = ctrl.compute_velocity_banded(
        kplan, res.potential_vb, jnp.asarray(costs), starts, quats, st,
        lane_minor=True, lane_map=res.lane_map,
    )
    np.testing.assert_allclose(
        np.asarray(cmd_bv.linear), np.asarray(cmd_vb.linear), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(cmd_bv.angular), np.asarray(cmd_vb.angular), rtol=1e-6
    )


def test_descend_paths_matches_pred_chain():
    """Greedy descent over the label field must reproduce the full-pred
    backtracking chain (same vertices while both valid, same endpoints)."""
    m = _terrain16()
    costs = np.asarray(
        0.1 * np.sin(np.arange(m.num_vertices)) ** 2, np.float32
    )
    _, W = _weights(m, costs)
    plan = pallas_banded.build_banded_kernel_plan(m, W)
    seeds = jnp.asarray([5, 200], jnp.int32)
    res = pallas_banded.batched_field_banded_pallas(m, W, plan, seeds)
    starts = jnp.asarray([250, 17], jnp.int32)

    path_d, valid_d = pallas_banded.descend_paths(
        plan, res.dist, starts, seeds, 64
    )
    for b in range(2):
        path_p, valid_p = sweeps.extract_path(
            res.pred[b], starts[b], seeds[b], 64
        )
        np.testing.assert_array_equal(np.asarray(valid_d[b]), np.asarray(valid_p))
        nv = int(np.asarray(valid_p).sum())
        np.testing.assert_array_equal(
            np.asarray(path_d[b][:nv]), np.asarray(path_p[:nv])
        )
        # chain actually ends at the seed
        assert int(path_d[b][nv - 1]) != int(path_d[b][nv]) or int(
            path_d[b][nv]
        ) == int(seeds[b])


def test_pred_at_vertices_matches_full_recovery():
    m = _terrain16()
    costs = np.zeros(m.num_vertices, np.float32)
    _, W = _weights(m, costs)
    plan = pallas_banded.build_banded_kernel_plan(m, W)
    seeds = jnp.asarray([0, 100], jnp.int32)
    res = pallas_banded.batched_field_banded_pallas(m, W, plan, seeds)

    rng = np.random.default_rng(0)
    vids = jnp.asarray(rng.integers(0, m.num_vertices, size=(2, 5)), jnp.int32)
    preds = pallas_banded.pred_at_vertices(plan, res.dist, vids)
    # fixed-point-explanation contract: dist[pred] + w(pred, v) == dist[v]
    from mesh_navigation_tpu.mesh.arrays import host_array

    adj = host_array(m, "adj_vertex")
    msk = host_array(m, "adj_mask")
    Wnp = np.asarray(W)
    dist = np.asarray(res.dist)
    full_pred = np.asarray(res.pred)
    for b in range(2):
        for k in range(5):
            v = int(vids[b, k])
            p = int(preds[b, k])
            fp = int(full_pred[b, v])
            if fp == v:
                assert p == v, (v, p)
            else:
                slots = np.nonzero((adj[v] == p) & msk[v])[0]
                assert slots.size == 1, (v, p)
                w = Wnp[v, slots[0]]
                np.testing.assert_allclose(
                    dist[b, p] + w, dist[b, v], rtol=1e-5, atol=1e-5
                )


def test_predecessors_pallas_matches_rolls():
    """The single-pass Pallas pred recovery must agree with the roll-based
    predecessors_banded on a residual-free terrain plan."""
    m = _terrain16()
    costs = np.asarray(
        0.1 * np.sin(np.arange(m.num_vertices)) ** 2, np.float32
    )
    _, W = _weights(m, costs)
    plan = pallas_banded.build_banded_kernel_plan(m, W)
    assert plan.n_residual == 0
    seeds = jnp.asarray([5, 200], jnp.int32)
    res = pallas_banded.banded_solve_padded(plan, seeds)
    B = 2
    R, C, V = plan.n_rows, plan.n_cols, plan.num_vertices
    dist_vb = res.d_pad[:R, :C, :B].reshape(R * C, B)[:V].astype(jnp.float32)

    pred_ref = np.asarray(pallas_banded.predecessors_banded(plan, dist_vb))
    pred_k = np.asarray(
        pallas_banded.predecessors_banded_pallas(plan, res.d_pad)[:, :B]
    )
    dist = np.asarray(dist_vb)
    # ties may break to a different class: accept when both preds explain
    # the label to tolerance (same criterion, same cost chains)
    diff = np.nonzero(pred_k != pred_ref)
    for v, b in zip(*diff):
        dp = dist[pred_k[v, b], b]
        dr = dist[pred_ref[v, b], b]
        assert np.isfinite(dp) and np.isfinite(dr), (v, b)
    # and the disagreement set must be tiny (ties only)
    assert len(diff[0]) <= 0.01 * m.num_vertices * B


def test_extract_paths_vb_matches_extract_path():
    m = _terrain16()
    costs = np.zeros(m.num_vertices, np.float32)
    _, W = _weights(m, costs)
    plan = pallas_banded.build_banded_kernel_plan(m, W)
    seeds = jnp.asarray([5, 200], jnp.int32)
    res = pallas_banded.batched_field_banded_pallas(m, W, plan, seeds)
    starts = jnp.asarray([250, 17], jnp.int32)
    pred_vb = res.pred.T  # [V, B]
    path_vb, valid_vb = pallas_banded.extract_paths_vb(
        pred_vb, starts, seeds, 64
    )
    for b in range(2):
        path_p, valid_p = sweeps.extract_path(res.pred[b], starts[b], seeds[b], 64)
        np.testing.assert_array_equal(np.asarray(path_vb[b]), np.asarray(path_p))
        np.testing.assert_array_equal(np.asarray(valid_vb[b]), np.asarray(valid_p))


def test_light_path_after_lethal_update():
    """Dynamic-cost light path (the live-replan loop): lethal-ize a region,
    refresh the planes ON DEVICE, re-solve through plan_batch_banded
    light=True, and check (a) field parity vs the oracle under the NEW
    costs, (b) pred validity / path termination, (c) lanes whose goal got
    walled off report NO_PATH_FOUND."""
    import jax

    from mesh_navigation_tpu.config import PlannerConfig
    from mesh_navigation_tpu.planners import DijkstraPlanner

    m = _terrain16()
    rng = np.random.default_rng(9)
    costs = rng.uniform(0.0, 0.5, m.num_vertices).astype(np.float32)
    ew0, W0 = _weights(m, costs)
    plan0 = pallas_banded.build_banded_kernel_plan(m, W0)

    # lethal wall across the middle (y = 4 line; vertex id = x*16 + y with
    # spacing 0.5, so id % 16 == 8), leaving no gap
    costs2 = costs.copy()
    wall = (np.arange(m.num_vertices) % 16 == 8)
    costs2[wall] = np.inf
    ew2, W2 = _weights(m, costs2)
    plan2 = jax.jit(pallas_banded.refresh_banded_planes)(plan0, jnp.asarray(W2))

    planner = DijkstraPlanner(
        m, PlannerConfig(method="batched", ordered_rounds=0, cost_limit=1.0),
        max_path_len=128,
    )
    # starts on one side, goals split: one same-side (reachable), one across
    starts = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 1.0, 0.0]], jnp.float32)
    goals = jnp.asarray([[6.0, 2.0, 0.0], [6.0, 7.0, 0.0]], jnp.float32)
    res = planner.plan_batch_banded(
        jnp.asarray(W2), plan2, starts, goals, light=True
    )
    from mesh_navigation_tpu.api.outcomes import Outcome

    assert int(res.outcome[0]) == Outcome.SUCCESS
    assert int(res.outcome[1]) == Outcome.NO_PATH_FOUND

    # field parity vs oracle under the NEW cost field, reachable lane
    from mesh_navigation_tpu.mesh import query

    grid = planner.grid
    gv = int(query.nearest_vertex(m, grid, goals[0])[0])
    od = _oracle(m, ew2, costs2, gv)
    got = np.asarray(res.potential[0])
    ok = np.isfinite(od)
    np.testing.assert_allclose(got[ok], od[ok], rtol=1e-3, atol=1e-3)
    assert not np.isfinite(got[~ok]).any()

    # path terminates at the goal and stays on finite-cost vertices
    valid = np.asarray(res.path_valid[0])
    assert valid.any()


def test_refresh_from_costs_matches_weight_table_path():
    """The gather-free cost->plane refresh must equal the slot-weight-table
    refresh exactly (same traversability rules, same float math shape)."""
    import jax

    from mesh_navigation_tpu.ops import sweeps as _sweeps

    m = _terrain16()
    rng = np.random.default_rng(11)
    costs0 = rng.uniform(0.0, 0.5, m.num_vertices).astype(np.float32)
    _, W0 = _weights(m, costs0, cost_limit=1.2, edge_cost_factor=0.7)
    plan0 = pallas_banded.build_banded_kernel_plan(m, W0)

    costs1 = rng.uniform(0.0, 1.5, m.num_vertices).astype(np.float32)
    costs1[10:20] = np.inf
    ew1 = _sweeps.compute_edge_weights(m, jnp.asarray(costs1), 0.7)
    W1 = _sweeps.slot_weights(m, ew1, jnp.asarray(costs1), 1.2)
    via_table = pallas_banded.refresh_banded_planes(plan0, W1)
    via_costs = jax.jit(
        lambda p, c: pallas_banded.refresh_banded_planes_from_costs(
            p, c, edge_cost_factor=0.7, cost_limit=1.2
        )
    )(plan0, jnp.asarray(costs1))
    for name in ("down", "up", "a_fwd", "a_bwd", "res_w", "lat_fwd",
                 "lat_bwd", "xdown", "xup"):
        np.testing.assert_allclose(
            np.asarray(getattr(via_costs, name)),
            np.asarray(getattr(via_table, name)),
            rtol=1e-6, atol=1e-6, err_msg=name,
        )


def test_refresh_from_costs_irregular():
    from mesh_navigation_tpu.mesh import reorder, synthetic as _syn
    from mesh_navigation_tpu.ops import sweeps as _sweeps

    v, f = _syn.irregular_terrain_mesh(14, 14, spacing=0.5, jitter=0.4,
                                       hills=1.0, seed=3)
    m = reorder.build_reordered_mesh(v, f)
    rng = np.random.default_rng(4)
    costs0 = np.zeros(m.num_vertices, np.float32)
    _, W0 = _weights(m, costs0, cost_limit=2.0, edge_cost_factor=1.0)
    plan0 = pallas_banded.build_banded_kernel_plan(m, W0)
    assert plan0.n_residual > 0   # xlanes may be empty at this tiny scale

    costs1 = rng.uniform(0.0, 0.8, m.num_vertices).astype(np.float32)
    ew1 = _sweeps.compute_edge_weights(m, jnp.asarray(costs1), 1.0)
    W1 = _sweeps.slot_weights(m, ew1, jnp.asarray(costs1), 2.0)
    via_table = pallas_banded.refresh_banded_planes(plan0, W1)
    via_costs = pallas_banded.refresh_banded_planes_from_costs(
        plan0, jnp.asarray(costs1), edge_cost_factor=1.0, cost_limit=2.0
    )
    for name in ("down", "up", "a_fwd", "a_bwd", "res_w", "xdown", "xup"):
        np.testing.assert_allclose(
            np.asarray(getattr(via_costs, name)),
            np.asarray(getattr(via_table, name)),
            rtol=1e-6, atol=1e-6, err_msg=name,
        )


def test_warm_resolve_matches_cold():
    """Incremental changed-region resolve (warm_d/warm_changed): raise a
    cost disc, warm-resolve from the previous field, and match the cold
    solve on the refreshed planes exactly; then clear the disc (weight
    DROP) and warm-resolve back."""
    import jax

    m = _terrain16()
    rng = np.random.default_rng(11)
    costs = rng.uniform(0.0, 0.4, m.num_vertices).astype(np.float32)
    ew0, W0 = _weights(m, costs)
    plan0 = pallas_banded.build_banded_kernel_plan(m, W0)
    seeds = jnp.asarray([3, 100, 200], jnp.int32)
    TOL = dict(atol=1e-6, rtol=1e-6)
    res0 = pallas_banded.banded_solve_padded(plan0, seeds, **TOL)
    assert bool(res0.converged)

    # raise: lethal disc around vertex 120
    pos = np.asarray(m.vertices)
    d2 = np.sum((pos[:, :2] - pos[120, :2]) ** 2, axis=1)
    costs2 = np.where(d2 < 1.0, np.inf, costs).astype(np.float32)
    plan2 = pallas_banded.refresh_banded_planes_from_costs(
        plan0, jnp.asarray(costs2), edge_cost_factor=1.0, cost_limit=1.0
    )
    changed = pallas_banded.changed_plane_from_costs(
        plan0, jnp.asarray(costs), jnp.asarray(costs2)
    )
    warm = pallas_banded.banded_solve_padded(
        plan2, seeds, **TOL, warm_d=res0.d_pad, warm_changed=changed,
        warm_pos=pallas_banded.position_planes(plan2, m),
        converge="check",
    )
    cold = pallas_banded.banded_solve_padded(plan2, seeds, **TOL)
    assert bool(warm.converged) and bool(cold.converged)
    np.testing.assert_allclose(
        np.asarray(warm.d_pad), np.asarray(cold.d_pad), rtol=1e-4, atol=1e-5
    )

    # drop: clear the disc again -> labels must come back DOWN to res0
    changed_back = pallas_banded.changed_plane_from_costs(
        plan0, jnp.asarray(costs2), jnp.asarray(costs)
    )
    back = pallas_banded.banded_solve_padded(
        plan0, seeds, **TOL, warm_d=warm.d_pad, warm_changed=changed_back,
        converge="check",
    )
    assert bool(back.converged)
    np.testing.assert_allclose(
        np.asarray(back.d_pad), np.asarray(res0.d_pad), rtol=1e-4, atol=1e-5
    )


def test_two_level_scan_matches_flat():
    """At Cp >= 64 the plan builds two-level scan tables (n_scan2 > 0);
    the decimated boundary scan must produce the same fixed point as the
    flat Hillis-Steele (scan_steps=full via a plan with tables stripped)."""
    import dataclasses as _dc

    v, f = synthetic.terrain_mesh(
        64, 64, spacing=0.5, hills=1.5, roughness=0.03, seed=6
    )
    m = build_mesh(v, f)
    rng = np.random.default_rng(3)
    costs = rng.uniform(0.0, 0.5, m.num_vertices).astype(np.float32)
    ew, W = _weights(m, costs)
    plan = pallas_banded.build_banded_kernel_plan(m, W)
    assert plan.n_scan2 > 0
    seeds = jnp.asarray([5, 1000, 4000], jnp.int32)
    res2 = pallas_banded.banded_solve_padded(plan, seeds, atol=0.0, rtol=0.0)
    plan_flat = _dc.replace(
        plan, n_scan2=0, l2_fwd=None, l2_bwd=None,
        wback_fwd=None, wback_bwd=None,
    )
    res1 = pallas_banded.banded_solve_padded(
        plan_flat, seeds, atol=0.0, rtol=0.0
    )
    assert bool(res2.converged) and bool(res1.converged)
    d1 = np.asarray(res1.d_pad)
    d2 = np.asarray(res2.d_pad)
    fin = np.isfinite(d1)
    assert (np.isfinite(d2) == fin).all()
    np.testing.assert_allclose(d2[fin], d1[fin], rtol=1e-6, atol=1e-6)
    # and against the oracle on one lane
    od = _oracle(m, ew, costs, 1000)
    got = d2[:, : plan.n_cols, 1].reshape(-1)[: m.num_vertices]
    ofin = np.isfinite(od)
    np.testing.assert_allclose(got[ofin], od[ofin], rtol=1e-5, atol=1e-5)


def test_warm_window_matches_cold():
    """Windowed warm resolve (warm_window row slab): raise a lethal disc,
    warm-resolve inside a 128-row window, and match the cold solve on the
    refreshed planes; then clear it (weight DROP — improvements may cross
    the window seam, exercising the bit-exact border certificate + full
    fallback) and match the original field again."""
    import jax

    v, f = synthetic.terrain_mesh(
        160, 16, spacing=0.5, hills=1.0, roughness=0.01, seed=2
    )
    m = build_mesh(v, f)
    rng = np.random.default_rng(5)
    costs = rng.uniform(0.0, 0.4, m.num_vertices).astype(np.float32)
    _, W0 = _weights(m, costs, cost_limit=2.0)
    plan0 = pallas_banded.build_banded_kernel_plan(m, W0)
    assert plan0.n_rows > 128     # the window must be a strict sub-slab
    seeds = jnp.asarray([3, 700, 2100], jnp.int32)
    TOL = dict(atol=1e-6, rtol=1e-6)
    res0 = pallas_banded.banded_solve_padded(plan0, seeds, **TOL)
    assert bool(res0.converged)

    pos = np.asarray(m.vertices)
    d2 = np.sum((pos[:, :2] - pos[1290, :2]) ** 2, axis=1)
    costs2 = np.where(d2 < 1.0, np.inf, costs).astype(np.float32)
    plan2 = pallas_banded.refresh_banded_planes_from_costs(
        plan0, jnp.asarray(costs2), edge_cost_factor=1.0, cost_limit=1.0
    )
    changed = pallas_banded.changed_plane_from_costs(
        plan0, jnp.asarray(costs), jnp.asarray(costs2)
    )
    warm = pallas_banded.banded_solve_padded(
        plan2, seeds, **TOL, warm_d=res0.d_pad, warm_changed=changed,
        warm_pos=pallas_banded.position_planes(plan2, m),
        warm_window=128, converge="check",
    )
    cold = pallas_banded.banded_solve_padded(plan2, seeds, **TOL)
    assert bool(warm.converged) and bool(cold.converged)
    np.testing.assert_allclose(
        np.asarray(warm.d_pad), np.asarray(cold.d_pad), rtol=1e-4, atol=1e-5
    )

    changed_back = pallas_banded.changed_plane_from_costs(
        plan0, jnp.asarray(costs2), jnp.asarray(costs)
    )
    back = pallas_banded.banded_solve_padded(
        plan0, seeds, **TOL, warm_d=warm.d_pad, warm_changed=changed_back,
        warm_window=128, converge="check",
    )
    assert bool(back.converged)
    np.testing.assert_allclose(
        np.asarray(back.d_pad), np.asarray(res0.d_pad), rtol=1e-4, atol=1e-5
    )


def test_warm_window_seam_crossing_falls_back():
    """A weight DROP whose improvements must propagate far beyond the
    window: clearing a wall re-routes labels across most of the mesh. The
    changed rows fit the 128-row window, but the slab's ghost-border rows
    change — the bit-exact seam certificate must reject the slab result and
    the full fallback must still reach the cold fixed point."""
    v, f = synthetic.terrain_mesh(
        160, 16, spacing=0.5, hills=0.0, roughness=0.0, seed=2
    )
    m = build_mesh(v, f)
    costs = np.full(m.num_vertices, 0.1, np.float32)
    # wall across rows 79-80, one-column gap at col 0: labels above the
    # wall detour through the gap
    vid = np.arange(m.num_vertices)
    row, col = vid // 16, vid % 16
    wall = ((row == 79) | (row == 80)) & (col > 0)
    costs_w = np.where(wall, np.inf, costs).astype(np.float32)
    _, W0 = _weights(m, costs, cost_limit=200.0)
    plan0 = pallas_banded.build_banded_kernel_plan(m, W0)
    plan_w = pallas_banded.refresh_banded_planes_from_costs(
        plan0, jnp.asarray(costs_w), edge_cost_factor=1.0, cost_limit=200.0
    )
    seeds = jnp.asarray([8], jnp.int32)        # row 0: below the wall
    TOL = dict(atol=1e-6, rtol=1e-6)
    res_w = pallas_banded.banded_solve_padded(plan_w, seeds, **TOL)
    assert bool(res_w.converged)

    # clear the wall: changed rows 79-80 fit the window; improvements reach
    # every row above
    changed = pallas_banded.changed_plane_from_costs(
        plan0, jnp.asarray(costs_w), jnp.asarray(costs)
    )
    warm = pallas_banded.banded_solve_padded(
        plan0, seeds, **TOL, warm_d=res_w.d_pad, warm_changed=changed,
        warm_window=128, converge="check",
    )
    cold = pallas_banded.banded_solve_padded(plan0, seeds, **TOL)
    assert bool(warm.converged)
    np.testing.assert_allclose(
        np.asarray(warm.d_pad), np.asarray(cold.d_pad), rtol=1e-4, atol=1e-5
    )


def test_warm_raised_clear_matches_cold():
    """Raise-aware invalidation (warm_raised): a pure CLEAR update has an
    empty raised set, so the cut threshold is +inf and the resolve runs by
    relaxation from the dirty rows alone — and must still reach the cold
    fixed point (labels must come back DOWN to the pre-obstacle field).
    A mixed raise+drop update (moved obstacle) must also match cold."""
    m = _terrain16()
    rng = np.random.default_rng(11)
    costs = rng.uniform(0.0, 0.4, m.num_vertices).astype(np.float32)
    _, W0 = _weights(m, costs)
    plan0 = pallas_banded.build_banded_kernel_plan(m, W0)
    seeds = jnp.asarray([3, 100, 200], jnp.int32)
    TOL = dict(atol=1e-6, rtol=1e-6)
    res0 = pallas_banded.banded_solve_padded(plan0, seeds, **TOL)

    pos = np.asarray(m.vertices)
    d2 = np.sum((pos[:, :2] - pos[120, :2]) ** 2, axis=1)
    costs2 = np.where(d2 < 1.0, np.inf, costs).astype(np.float32)
    plan2 = pallas_banded.refresh_banded_planes_from_costs(
        plan0, jnp.asarray(costs2), edge_cost_factor=1.0, cost_limit=1.0
    )
    changed = pallas_banded.changed_plane_from_costs(
        plan0, jnp.asarray(costs), jnp.asarray(costs2)
    )
    raised = pallas_banded.raised_plane_from_costs(
        plan0, jnp.asarray(costs), jnp.asarray(costs2)
    )
    # raise: raised == changed (all changes are increases)
    np.testing.assert_array_equal(np.asarray(raised), np.asarray(changed))
    warm = pallas_banded.banded_solve_padded(
        plan2, seeds, **TOL, warm_d=res0.d_pad, warm_changed=changed,
        warm_raised=raised, warm_pos=pallas_banded.position_planes(plan2, m),
        converge="check",
    )
    cold2 = pallas_banded.banded_solve_padded(plan2, seeds, **TOL)
    np.testing.assert_allclose(
        np.asarray(warm.d_pad), np.asarray(cold2.d_pad), rtol=1e-4, atol=1e-5
    )

    # pure clear: raised set EMPTY -> no invalidation, relaxation only
    raised_back = pallas_banded.raised_plane_from_costs(
        plan0, jnp.asarray(costs2), jnp.asarray(costs)
    )
    assert not bool(np.asarray(raised_back).any())
    changed_back = pallas_banded.changed_plane_from_costs(
        plan0, jnp.asarray(costs2), jnp.asarray(costs)
    )
    back = pallas_banded.banded_solve_padded(
        plan0, seeds, **TOL, warm_d=warm.d_pad, warm_changed=changed_back,
        warm_raised=raised_back, converge="check",
    )
    assert bool(back.converged)
    np.testing.assert_allclose(
        np.asarray(back.d_pad), np.asarray(res0.d_pad), rtol=1e-4, atol=1e-5
    )

    # mixed: move the disc (raises at the new site, drops at the old)
    d2b = np.sum((pos[:, :2] - pos[140, :2]) ** 2, axis=1)
    costs3 = np.where(d2b < 1.0, np.inf, costs).astype(np.float32)
    plan3 = pallas_banded.refresh_banded_planes_from_costs(
        plan0, jnp.asarray(costs3), edge_cost_factor=1.0, cost_limit=1.0
    )
    warm3 = pallas_banded.banded_solve_padded(
        plan3, seeds, **TOL, warm_d=warm.d_pad,
        warm_changed=pallas_banded.changed_plane_from_costs(
            plan0, jnp.asarray(costs2), jnp.asarray(costs3)
        ),
        warm_raised=pallas_banded.raised_plane_from_costs(
            plan0, jnp.asarray(costs2), jnp.asarray(costs3)
        ),
        warm_pos=pallas_banded.position_planes(plan3, m),
        converge="check",
    )
    cold3 = pallas_banded.banded_solve_padded(plan3, seeds, **TOL)
    np.testing.assert_allclose(
        np.asarray(warm3.d_pad), np.asarray(cold3.d_pad), rtol=1e-4, atol=1e-5
    )
