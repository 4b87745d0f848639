"""Irregular (non-grid) meshes through the banded fast path: band reordering,
residual-tolerant row skip, partial scan depth, and the residual-aware Pallas
predecessor recovery — parity against the heap-Dijkstra oracle throughout.

The reference's planners accept arbitrary scanned meshes
(dijkstra_mesh_planner.cpp:217-398); these tests pin the TPU build to the
same generality: jittered-Delaunay topology (degrees ~3..20, no constant
offsets) must produce the exact fixed point through the SAME kernel the 1M
grid bench uses."""

import numpy as np
import jax.numpy as jnp

from mesh_navigation_tpu.mesh import build_mesh, reorder, synthetic
from mesh_navigation_tpu.mesh.arrays import register_host_arrays
from mesh_navigation_tpu.ops import banded, pallas_banded, structured, sweeps
from mesh_navigation_tpu.utils import oracle


def _weights(mesh, costs, cost_limit=2.0, edge_cost_factor=1.0):
    ew = sweeps.compute_edge_weights(mesh, jnp.asarray(costs), edge_cost_factor)
    W = sweeps.slot_weights(mesh, ew, jnp.asarray(costs), cost_limit)
    return ew, W


def _oracle(mesh, ew, costs, seed, cost_limit=2.0):
    adj = oracle.mesh_adjacency(mesh)
    od, _ = oracle.dijkstra_oracle(
        mesh.num_vertices, adj, np.asarray(ew), np.asarray(costs), seed, cost_limit
    )
    return od


def _irregular(n=16, seed=7):
    v, f = synthetic.irregular_terrain_mesh(
        n, n, spacing=0.5, jitter=0.45, hills=1.0, roughness=0.01, seed=seed
    )
    return reorder.build_reordered_mesh(v, f)


def test_band_order_recovers_grid_width():
    v, f = synthetic.terrain_mesh(16, 12, spacing=0.5, hills=1.0, seed=0)
    _, n = reorder.band_order(v)
    # the grid is x-major 16x12: rows of the band order should match the
    # minor-axis length (12) — sqrt(192 * (7.5/5.5)) ~ 16 columns along x
    assert 12 <= n <= 20


def test_irregular_coverage_and_residuals():
    m = _irregular()
    costs = np.zeros(m.num_vertices, np.float32)
    _, W = _weights(m, costs)
    plan = pallas_banded.build_banded_kernel_plan(m, W)
    assert plan.coverage > 0.85
    assert plan.n_residual > 0   # genuinely non-grid


def test_irregular_banded_parity_and_pred():
    m = _irregular()
    rng = np.random.default_rng(3)
    costs = rng.uniform(0.0, 0.6, m.num_vertices).astype(np.float32)
    ew, W = _weights(m, costs)
    plan = pallas_banded.build_banded_kernel_plan(m, W)
    seeds_l = [5, 111, 233, 207]
    res = pallas_banded.batched_field_banded_pallas(
        m, W, plan, jnp.asarray(seeds_l, jnp.int32)
    )
    assert bool(res.converged)
    for b, s in enumerate(seeds_l):
        od = _oracle(m, ew, costs, s)
        np.testing.assert_allclose(np.asarray(res.dist[b]), od, rtol=1e-3, atol=1e-3)

    # residual-aware pallas pred recovery: every non-seed reached vertex must
    # have a predecessor that explains its label (incl. residual-only edges)
    B = len(seeds_l)
    dist_vb = jnp.asarray(res.dist.T)
    padded = pallas_banded.prepare_padded(plan, jnp.asarray(seeds_l, jnp.int32))
    R, C, Cp = plan.n_rows, plan.n_cols, plan.n_cols_pad
    d_pad = padded.d0.at[...].set(jnp.inf)
    # rebuild padded field from dist
    dp = jnp.full((R * Cp, B), jnp.inf, jnp.float32)
    rows = jnp.arange(m.num_vertices) // C
    cols = jnp.arange(m.num_vertices) % C
    dp = dp.at[rows * Cp + cols].set(dist_vb)
    Rp = padded.d0.shape[0]
    dp = jnp.pad(dp.reshape(R, Cp, B), ((0, Rp - R), (0, 0), (0, 0)),
                 constant_values=jnp.inf)
    Bp = padded.d0.shape[2]
    dp = jnp.pad(dp, ((0, 0), (0, 0), (0, Bp - B)), constant_values=jnp.inf)
    pred = np.asarray(
        pallas_banded.predecessors_banded_pallas(plan, dp, tol=1e-4)
    )[:, :B]
    dn = np.asarray(dist_vb)
    Wn = np.asarray(W)
    adjn = np.asarray(m.adj_vertex)
    for b, s in enumerate(seeds_l):
        for v in range(0, m.num_vertices, 17):
            if v == s or not np.isfinite(dn[v, b]) or dn[v, b] == 0:
                continue
            p = pred[v, b]
            assert p != v, f"stalled pred at {v}"
            slot = np.nonzero(adjn[v] == p)[0]
            assert len(slot), f"pred {p} not adjacent to {v}"
            w = Wn[v, slot].min()
            assert dn[p, b] + w <= dn[v, b] * (1 + 1e-3) + 1e-3


def test_partial_scan_depth_same_fixed_point():
    """scan_steps=1 (only ±1 lateral relaxations per pass) must still reach
    the exact fixed point via the dirty-row mechanism."""
    v, f = synthetic.terrain_mesh(16, 16, spacing=0.5, hills=1.5,
                                  roughness=0.02, seed=3)
    m = build_mesh(v, f)
    rng = np.random.default_rng(1)
    costs = rng.uniform(0.0, 0.8, m.num_vertices).astype(np.float32)
    ew, W = _weights(m, costs, cost_limit=1.0)
    plan = pallas_banded.build_banded_kernel_plan(m, W)
    seeds = jnp.asarray([17, 100, 255], jnp.int32)
    for steps in (1, 2, 3):
        res = pallas_banded.banded_solve_padded(plan, seeds, scan_steps=steps)
        assert bool(res.converged)
        R, C = plan.n_rows, plan.n_cols
        dist = np.asarray(
            res.d_pad[:R, :C, :3].reshape(R * C, 3)[: m.num_vertices]
        )
        for b, s in enumerate([17, 100, 255]):
            od = _oracle(m, ew, costs, s, cost_limit=1.0)
            np.testing.assert_allclose(dist[:, b], od, rtol=1e-3, atol=1e-3)


def test_irregular_partial_scan_parity():
    """Residual dirtying + partial scans together (the irregular 1M config)."""
    m = _irregular(14, seed=11)
    costs = np.zeros(m.num_vertices, np.float32)
    ew, W = _weights(m, costs)
    plan = pallas_banded.build_banded_kernel_plan(m, W)
    assert plan.n_residual > 0
    seeds = jnp.asarray([3, 99], jnp.int32)
    res = pallas_banded.banded_solve_padded(plan, seeds, scan_steps=2)
    assert bool(res.converged)
    R, C = plan.n_rows, plan.n_cols
    dist = np.asarray(res.d_pad[:R, :C, :2].reshape(R * C, 2)[: m.num_vertices])
    for b, s in enumerate([3, 99]):
        od = _oracle(m, ew, costs, s)
        np.testing.assert_allclose(dist[:, b], od, rtol=1e-3, atol=1e-3)


def test_refresh_offset_planes_matches_rebuild():
    m = _irregular(14, seed=5)
    rng = np.random.default_rng(0)
    costs0 = rng.uniform(0.0, 0.5, m.num_vertices).astype(np.float32)
    _, W0 = _weights(m, costs0)
    plan0 = structured.build_offset_plan(m, W0)
    # change costs (incl. new lethals)
    costs1 = costs0.copy()
    costs1[::7] = np.inf
    _, W1 = _weights(m, costs1)
    refreshed = structured.refresh_offset_planes(plan0, W1)
    rebuilt = structured.build_offset_plan(m, W1)
    assert refreshed.offsets == rebuilt.offsets
    np.testing.assert_allclose(
        np.asarray(refreshed.planes), np.asarray(rebuilt.planes)
    )
    np.testing.assert_allclose(np.asarray(refreshed.res_w), np.asarray(rebuilt.res_w))


def test_rcm_order_reduces_bandwidth():
    m = _irregular(14, seed=2)
    from mesh_navigation_tpu.mesh.arrays import host_array

    edges = host_array(m, "edges")
    perm = reorder.rcm_order(edges, m.num_vertices)
    inv = np.empty(m.num_vertices, np.int64)
    inv[perm] = np.arange(m.num_vertices)
    e2 = inv[np.asarray(edges, np.int64)]
    bw = np.abs(e2[:, 0] - e2[:, 1]).max()
    assert bw <= 3 * int(np.sqrt(m.num_vertices))


def test_four_dir_same_fixed_point():
    """Opt-in 4-directional rounds (transpose_banded_plan) must reach the
    same fixed point as the default row-only rounds."""
    m = _irregular(12, seed=9)
    costs = np.zeros(m.num_vertices, np.float32)
    ew, W = _weights(m, costs)
    plan = pallas_banded.build_banded_kernel_plan(m, W)
    seeds = jnp.asarray([7, 120], jnp.int32)
    res = pallas_banded.banded_solve_padded(plan, seeds, four_dir=True)
    assert bool(res.converged)
    R, C = plan.n_rows, plan.n_cols
    dist = np.asarray(res.d_pad[:R, :C, :2].reshape(R * C, 2)[: m.num_vertices])
    for b, s in enumerate([7, 120]):
        od = _oracle(m, ew, costs, s)
        np.testing.assert_allclose(dist[:, b], od, rtol=1e-3, atol=1e-3)


def test_pred_at_vertices_covers_residual_edges():
    """The controller's on-the-fly pred lookup must find residual-only
    predecessors (irregular meshes): wherever the full residual-aware
    recovery explains a label, pred_at_vertices must not read self."""
    m = _irregular(16, seed=7)
    rng = np.random.default_rng(3)
    costs = rng.uniform(0.0, 0.6, m.num_vertices).astype(np.float32)
    ew, W = _weights(m, costs)
    plan = pallas_banded.build_banded_kernel_plan(m, W)
    assert plan.n_residual > 0
    seeds = jnp.asarray([5, 111], jnp.int32)
    res = pallas_banded.banded_solve_padded(plan, seeds)
    B = 2
    pred_full = np.asarray(
        pallas_banded.predecessors_banded_pallas(plan, res.d_pad, tol=1e-4)
    )[:, :B]

    V = m.num_vertices
    vids = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32)[None], (B, V))
    got = np.asarray(
        pallas_banded.pred_at_vertices(
            plan,
            res.d_pad[: plan.n_rows, : plan.n_cols, :B]
            .reshape(-1, B)[:V]
            .astype(jnp.float32),
            vids,
            tol=1e-4,
            lane_minor=True,
        )
    )                                                       # [B, V]
    dn = np.asarray(
        res.d_pad[: plan.n_rows, : plan.n_cols, :B].reshape(-1, B)[:V]
    )
    ids = np.arange(V)
    for b in range(B):
        full_has = pred_full[:, b] != ids
        got_has = got[b] != ids
        reached = np.isfinite(dn[:, b]) & (dn[:, b] > 0)
        # every label the full recovery explains must also be explained here
        missing = reached & full_has & ~got_has
        assert not missing.any(), f"lane {b}: {missing.sum()} unexplained"
        # and each returned pred must actually explain the label
        p = got[b]
        expl = p != ids
        lhs = dn[p[expl], b]
        assert np.all(lhs <= dn[expl, b] * (1 + 1e-3) + 1e-3)
