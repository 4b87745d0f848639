"""Banded fast-sweeping eikonal kernel (ops/pallas_eikonal.py) vs the
gather-based fixed-point solver (ops/eikonal.py) — same CVP unfolding fixed
point, plus the lazy path descent and the CVP planner scale path."""

import numpy as np
import jax.numpy as jnp

from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.ops import eikonal, pallas_eikonal as pe, sweeps


def _terrain(n=10, seed=3):
    v, f = synthetic.terrain_mesh(n, n, spacing=0.5, hills=1.5,
                                  roughness=0.02, seed=seed)
    return build_mesh(v, f)


def _field_ref(m, side, seed_v, seed_val, target_mask=None):
    sd = jnp.full(m.num_vertices, jnp.inf).at[jnp.asarray(seed_v)].set(
        jnp.asarray(seed_val)
    )
    return eikonal.eikonal_field(
        m, jnp.asarray(side), sd, update="unfolding", target_mask=target_mask
    )


def test_unfolding_value_matches_candidates():
    rng = np.random.default_rng(0)
    N = 256
    a = rng.uniform(0.5, 2.0, N).astype(np.float32)
    b = rng.uniform(0.5, 2.0, N).astype(np.float32)
    # triangle inequality-ish c
    c = np.clip(rng.uniform(0.5, 2.0, N), np.abs(a - b) + 0.05, a + b - 0.05).astype(np.float32)
    u1 = rng.uniform(0.0, 3.0, N).astype(np.float32)
    u2 = rng.uniform(0.0, 3.0, N).astype(np.float32)
    ref = eikonal.unfolding_candidates(
        jnp.asarray(u1), jnp.asarray(u2), jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
    )
    got = pe.unfolding_value(
        jnp.asarray(u1), jnp.asarray(u2), jnp.asarray(a), jnp.asarray(b),
        jnp.asarray(c), jnp.ones(N, bool),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref.value),
                               rtol=1e-5, atol=1e-5)


def test_grid_eikonal_parity():
    m = _terrain()
    side = np.asarray(m.edge_dist)
    plan = pe.build_eikonal_kernel_plan(m, side)
    assert plan.coverage == 1.0
    seed_v = jnp.asarray([[5, 5, 5], [44, 45, 46]], jnp.int32)
    seed_d = jnp.asarray([[0.0, np.inf, np.inf], [0.1, 0.2, 0.15]], jnp.float32)
    dist, rounds, conv = pe.eikonal_field_banded(m, plan, seed_v, seed_d)
    assert bool(conv)
    for b in range(2):
        sv = np.asarray(seed_v[b])
        sd = np.asarray(seed_d[b])
        keep = np.isfinite(sd)
        ref = _field_ref(m, side, sv[keep], sd[keep])
        got = np.asarray(dist[b])
        rd = np.asarray(ref.dist)
        ok = np.isfinite(rd)
        np.testing.assert_allclose(got[ok], rd[ok], rtol=1e-4, atol=1e-4)
        assert not np.isfinite(got[~ok]).any()


def test_weighted_side_lengths_parity():
    """CVP semantics: cost-weighted edge weights as the metric."""
    m = _terrain(10, seed=7)
    rng = np.random.default_rng(1)
    costs = rng.uniform(0.0, 0.6, m.num_vertices).astype(np.float32)
    side = np.asarray(sweeps.compute_edge_weights(m, jnp.asarray(costs), 1.0))
    plan = pe.build_eikonal_kernel_plan(m, side)
    seed_v = jnp.asarray([[40, 40, 40]], jnp.int32)
    seed_d = jnp.asarray([[0.0, np.inf, np.inf]], jnp.float32)
    dist, _, conv = pe.eikonal_field_banded(m, plan, seed_v, seed_d)
    assert bool(conv)
    ref = _field_ref(m, side, [40], [0.0])
    rd = np.asarray(ref.dist)
    ok = np.isfinite(rd)
    np.testing.assert_allclose(np.asarray(dist[0])[ok], rd[ok],
                               rtol=1e-4, atol=1e-4)


def test_target_mask_parity():
    m = _terrain(10, seed=5)
    rng = np.random.default_rng(2)
    costs = rng.uniform(0.0, 1.4, m.num_vertices).astype(np.float32)
    side = np.asarray(m.edge_dist)
    tm = costs < 1.0
    plan = pe.apply_target_mask(pe.build_eikonal_kernel_plan(m, side), tm)
    seed_v = jnp.asarray([[7, 7, 7]], jnp.int32)
    seed_d = jnp.asarray([[0.0, np.inf, np.inf]], jnp.float32)
    dist, _, conv = pe.eikonal_field_banded(m, plan, seed_v, seed_d)
    ref = _field_ref(m, side, [7], [0.0], target_mask=jnp.asarray(tm))
    rd = np.asarray(ref.dist)
    got = np.asarray(dist[0])
    ok = np.isfinite(rd)
    np.testing.assert_allclose(got[ok], rd[ok], rtol=1e-4, atol=1e-4)
    assert not np.isfinite(got[~ok]).any()


def test_cvp_planner_banded_matches_batch():
    from mesh_navigation_tpu.config import PlannerConfig
    from mesh_navigation_tpu.planners import CVPPlanner

    m = _terrain(12, seed=4)
    rng = np.random.default_rng(3)
    costs = rng.uniform(0.0, 0.4, m.num_vertices).astype(np.float32)
    planner = CVPPlanner(
        m, PlannerConfig(cost_limit=2.0, max_sweeps=4096), max_path_len=96
    )
    ew = planner.prepare_weights(jnp.asarray(costs), 1.0)
    kplan = planner.prepare_eikonal_plan(np.asarray(ew), costs)
    assert kplan is not None

    def on_surface(xy):
        # drop the pose onto the terrain (containing_face rejects poses
        # farther than max_dist=0.4 from the surface)
        from mesh_navigation_tpu.mesh.arrays import host_array

        vp = host_array(m, "vertices")
        i = np.argmin((vp[:, 0] - xy[0]) ** 2 + (vp[:, 1] - xy[1]) ** 2)
        return [xy[0], xy[1], float(vp[i, 2])]

    starts = jnp.asarray(
        [on_surface([1.0, 1.0]), on_surface([5.5, 1.0])], jnp.float32
    )
    goals = jnp.asarray(
        [on_surface([5.5, 5.5]), on_surface([1.0, 5.0])], jnp.float32
    )
    res_fast = planner.plan_batch_banded(ew, kplan, starts, goals)
    res_ref = planner.plan_batch(ew, jnp.asarray(costs), starts, goals)
    assert np.asarray(res_fast.outcome).tolist() == [0, 0]
    # potentials agree (the geodesic cost field, the parity contract)
    pot_f = np.asarray(res_fast.potential)
    pot_r = np.asarray(res_ref.potential)
    ok = np.isfinite(pot_r)
    np.testing.assert_allclose(pot_f[ok], pot_r[ok], rtol=1e-3, atol=1e-3)
    # path cost (= potential at start) within 1% of the reference batch cost
    # (res_ref cost is the euclidean pose-chain length; compare potentials at
    # the snapped start vertices instead)
    from mesh_navigation_tpu.mesh import query

    for b in range(2):
        sv = int(query.nearest_vertex(m, planner.grid, starts[b])[0])
        assert abs(pot_f[b, sv] - pot_r[b, sv]) <= 1e-3 + 1e-3 * pot_r[b, sv]
    # descent paths end on a goal-face seed vertex
    path = np.asarray(res_fast.path_positions)
    valid = np.asarray(res_fast.path_valid)
    assert valid[:, 0].all()


def test_irregular_mesh_eikonal():
    from mesh_navigation_tpu.mesh import reorder

    v, f = synthetic.irregular_terrain_mesh(
        12, 12, spacing=0.5, jitter=0.4, hills=1.0, seed=6
    )
    m = reorder.build_reordered_mesh(v, f)
    side = np.asarray(m.edge_dist)
    plan = pe.build_eikonal_kernel_plan(m, side)
    assert plan.n_residual > 0
    seed_v = jnp.asarray([[9, 9, 9]], jnp.int32)
    seed_d = jnp.asarray([[0.0, np.inf, np.inf]], jnp.float32)
    dist, rounds, conv = pe.eikonal_field_banded(m, plan, seed_v, seed_d)
    assert bool(conv)
    ref = _field_ref(m, side, [9], [0.0])
    rd = np.asarray(ref.dist)
    ok = np.isfinite(rd)
    np.testing.assert_allclose(np.asarray(dist[0])[ok], rd[ok],
                               rtol=1e-3, atol=1e-3)


def test_warm_start_matches_cold():
    """The Dijkstra warm start is a pure accelerator: the eikonal fixed
    point must be unchanged."""
    import numpy as np
    import jax.numpy as jnp

    from mesh_navigation_tpu.config import PlannerConfig
    from mesh_navigation_tpu.mesh import build_mesh, synthetic
    from mesh_navigation_tpu.mesh.arrays import host_array
    from mesh_navigation_tpu.ops import sweeps
    from mesh_navigation_tpu.planners import CVPPlanner

    v, f = synthetic.terrain_mesh(20, 20, spacing=0.5, hills=1.0,
                                  roughness=0.03, seed=8)
    mesh = build_mesh(v, f)
    rng = np.random.default_rng(2)
    costs = rng.uniform(0.0, 0.5, mesh.num_vertices).astype(np.float32)
    ew = np.asarray(sweeps.compute_edge_weights(mesh, jnp.asarray(costs), 1.0))

    vpos = host_array(mesh, "vertices")
    ids = rng.integers(0, mesh.num_vertices, 8)
    starts = jnp.asarray(vpos[ids[:4]])
    goals = jnp.asarray(vpos[ids[4:]])

    cvp_w = CVPPlanner(mesh, PlannerConfig(cost_limit=2.0), max_path_len=128)
    plan_w = cvp_w.prepare_eikonal_plan(ew, costs, warm_start=True)
    assert cvp_w._dij_plan is not None
    res_w = cvp_w.plan_batch_banded(jnp.asarray(ew), plan_w, starts, goals)

    cvp_c = CVPPlanner(mesh, PlannerConfig(cost_limit=2.0), max_path_len=128)
    plan_c = cvp_c.prepare_eikonal_plan(ew, costs, warm_start=False)
    assert cvp_c._dij_plan is None
    res_c = cvp_c.plan_batch_banded(jnp.asarray(ew), plan_c, starts, goals)

    pw = np.asarray(res_w.potential)
    pc = np.asarray(res_c.potential)
    fin = np.isfinite(pc)
    assert (np.isfinite(pw) == fin).all()
    np.testing.assert_allclose(pw[fin], pc[fin], rtol=5e-3, atol=1e-3)


def test_cvp_walked_path_parity_vs_native_fmm():
    """Automated FMM-oracle path-parity gate for the banded CVP scale path
    — keeps the loosened stopping tolerance (rtol 2e-3,
    planners/cvp.py::_plan_batch_banded_impl) honest: a future map or
    cost-profile change that eats the error slack must fail HERE, not only
    in the at-scale bench (cvp_mesh_planner.cpp:651-970 semantics)."""
    import pytest

    native = pytest.importorskip("mesh_navigation_tpu.native")
    if not native.available():
        pytest.skip("no native toolchain")

    from mesh_navigation_tpu.config import PlannerConfig
    from mesh_navigation_tpu.mesh import query
    from mesh_navigation_tpu.mesh.arrays import host_array
    from mesh_navigation_tpu.planners import CVPPlanner

    m = _terrain(16, seed=4)
    rng = np.random.default_rng(5)
    costs = rng.uniform(0.0, 0.4, m.num_vertices).astype(np.float32)
    planner = CVPPlanner(m, PlannerConfig(cost_limit=2.0), max_path_len=128)
    ew = planner.prepare_weights(jnp.asarray(costs), 1.0)
    ew_np = np.asarray(ew)
    kplan = planner.prepare_eikonal_plan(ew_np, costs)
    assert kplan is not None

    vp = host_array(m, "vertices")
    ids = rng.integers(0, m.num_vertices, 8)
    starts = jnp.asarray(vp[ids[:4]], jnp.float32)
    goals = jnp.asarray(vp[ids[4:]], jnp.float32)
    res = planner.plan_batch_banded(ew, kplan, starts, goals)
    assert np.isfinite(np.asarray(res.cost)).all()

    nm = native.NativeMesh(vp, host_array(m, "faces"))
    faces_np = host_array(m, "faces")
    pot = np.asarray(res.potential)
    for b in range(4):
        g_face = int(query.containing_face(m, planner.grid, goals[b])[0])
        gvid = faces_np[max(g_face, 0)]
        sd = np.linalg.norm(
            vp[gvid] - np.asarray(goals[b])[None, :], axis=1
        ).astype(np.float32)
        od, _, _ = nm.cvp(ew_np, costs, gvid, sd, 2.0)
        fin = np.isfinite(od)
        rel = np.abs(pot[b][fin] - od[fin]) / np.maximum(od[fin], 1e-3)
        # BASELINE contract: within 1% of the reference planner
        assert float(np.percentile(rel, 99.9)) < 0.01
        # walked path cost within 1% of the oracle potential at the start
        sv = int(query.nearest_vertex(m, planner.grid, starts[b])[0])
        cost_b = float(np.asarray(res.cost)[b])
        assert cost_b <= od[sv] * 1.01 + 1e-2


def test_hybrid_graph_transport_same_fixed_point():
    """graph_plan (hybrid Sethian + min-plus transport) must reach the same
    fixed point as the plain chunked-GS rounds: the triangle update lower-
    bounds the edge relaxation everywhere, so adding the graph constraints
    cannot move the fixed point."""
    from mesh_navigation_tpu.mesh.arrays import host_array
    from mesh_navigation_tpu.ops import pallas_banded as pb

    m = _terrain(12, seed=4)
    rng = np.random.default_rng(7)
    costs = rng.uniform(0.0, 0.4, m.num_vertices).astype(np.float32)
    side = sweeps.compute_edge_weights(m, jnp.asarray(costs), 1.0)
    plan = pe.build_eikonal_kernel_plan(m, np.asarray(side))

    # graph plan over the same side lengths (slot layout)
    ew_np = np.asarray(side)
    adj_e = host_array(m, "adj_edge")
    adj_m = host_array(m, "adj_mask")
    W = np.where(adj_m, ew_np[adj_e], np.inf).astype(np.float32)
    gplan = pb.build_banded_kernel_plan(m, W)

    seed_v = jnp.asarray([[3, 4, 5], [100, 101, 99]], jnp.int32)
    seed_d = jnp.asarray([[0.1, 0.2, 0.15], [0.0, 0.3, 0.2]], jnp.float32)
    res_plain = pe.eikonal_solve_padded(
        plan, seed_v, seed_d, atol=1e-6, rtol=1e-6
    )
    res_hyb = pe.eikonal_solve_padded(
        plan, seed_v, seed_d, atol=1e-6, rtol=1e-6, graph_plan=gplan,
        n_inner=2,
    )
    assert bool(res_hyb.converged)
    R, C = plan.n_rows, plan.n_cols
    V = m.num_vertices
    dp_ = np.asarray(res_plain.d_pad[:R, :C, :2].reshape(R * C, 2)[:V])
    dh = np.asarray(res_hyb.d_pad[:R, :C, :2].reshape(R * C, 2)[:V])
    np.testing.assert_allclose(dh, dp_, rtol=1e-4, atol=1e-4)
