"""Snap exactness for surface-offset queries — the r4 irregular-bench
parity regression class.

A navigation query is typically OFF the 2D-manifold surface along z (robot
pose at z=0, terrain at z≈2.5 — mesh_map.cpp:1161-1174 serves exactly these
through the kd-tree). A 3×3×3 probe around the query's own z-cell sees only
empty cells there; r4's dense batched snap then returned arbitrary far
vertices and the banded bench seeded solves ~130 units from the oracle's
goal (BENCH_r04: irregular parity 4.45e+01). build_grid now collapses z
into full-height column cells for low-profile meshes, which restores
brute-force exactness for any query whose xy lands within one cell ring.

These tests pin:
  1. batch + single snap == brute force on z-offset queries (grid + irregular)
  2. the full bench-configuration light pipeline (atol=1e-3, rtol=2e-3,
     bucket-grouped lanes, residual int8 preds) against the Dijkstra oracle
     using the bench's OFF-SURFACE scenario sampling — the exact failing
     configuration of BENCH_r04, at test scale.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mesh_navigation_tpu.config import PlannerConfig
from mesh_navigation_tpu.mesh import build_mesh, query, reorder, synthetic
from mesh_navigation_tpu.mesh.arrays import host_array
from mesh_navigation_tpu.ops import sweeps
from mesh_navigation_tpu.planners.dijkstra import DijkstraPlanner
from mesh_navigation_tpu.utils import oracle


def _snap_vs_brute(mesh, n_pts=256, seed=0):
    grid = query.build_grid(mesh)
    vpos = host_array(mesh, "vertices")
    rng = np.random.default_rng(seed)
    lo = vpos.min(axis=0)
    hi = vpos.max(axis=0)
    p = rng.uniform(lo, hi, size=(n_pts, 3)).astype(np.float32)
    p[:, 2] = 0.0                       # bench-style off-surface queries
    pts = jnp.asarray(p)
    vb, _ = query.nearest_vertex_batch(mesh, grid, pts)
    vs = jax.vmap(lambda q: query.nearest_vertex(mesh, grid, q)[0])(pts)
    vb, vs = np.asarray(vb), np.asarray(vs)
    for i in range(n_pts):
        d2 = ((vpos - p[i]) ** 2).sum(axis=1)
        ref = d2.min()
        assert d2[vb[i]] <= ref + 1e-5, (
            f"batch snap not nearest at {i}: {d2[vb[i]]:.4f} vs {ref:.4f}"
        )
        assert d2[vs[i]] <= ref + 1e-5, (
            f"single snap not nearest at {i}: {d2[vs[i]]:.4f} vs {ref:.4f}"
        )


def test_snap_offset_queries_exact_terrain():
    v, f = synthetic.terrain_mesh(
        48, 48, spacing=0.5, hills=2.0, roughness=0.01, seed=0
    )
    _snap_vs_brute(build_mesh(v, f))


def test_snap_offset_queries_exact_irregular():
    v, f = synthetic.irregular_terrain_mesh(
        48, 48, spacing=0.5, jitter=0.45, hills=2.0, roughness=0.01, seed=1
    )
    _snap_vs_brute(reorder.build_reordered_mesh(v, f))


def test_bench_config_light_parity_irregular():
    """The BENCH_r04 failing configuration at test scale: irregular
    (residual) mesh, light banded path, atol=1e-3/rtol=2e-3, off-surface
    scenario sampling, parity gate at 1% on >= 8 lanes."""
    n = 40
    v, f = synthetic.irregular_terrain_mesh(
        n, n, spacing=0.5, jitter=0.45, hills=2.0, roughness=0.01, seed=1
    )
    mesh = reorder.build_reordered_mesh(v, f)
    nz = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1.0, 1.0)
    costs_np = np.arccos(nz).astype(np.float32)
    W_np = sweeps.slot_weights_np(
        mesh, costs_np, cost_limit=2.0, edge_cost_factor=1.0
    )
    planner = DijkstraPlanner(
        mesh, PlannerConfig(method="batched", ordered_rounds=0, cost_limit=2.0),
        max_path_len=3 * n,
    )
    kplan = planner.prepare_banded_plan(W_np)
    assert kplan is not None and kplan.n_residual > 0

    rng = np.random.default_rng(0)
    B = 16
    extent = n * 0.5 - 1.0
    s = rng.uniform(1, extent, size=(B, 3)).astype(np.float32)
    g = rng.uniform(1, extent, size=(B, 3)).astype(np.float32)
    s[:, 2] = 0.0
    g[:, 2] = 0.0
    res = planner.plan_batch_banded(
        jnp.asarray(W_np), kplan, jnp.asarray(s), jnp.asarray(g),
        light=True, atol=1e-3, rtol=2e-3, grid=planner.grid,
    )
    pot = np.asarray(res.potential)
    gv = np.asarray(
        query.nearest_vertex_batch(mesh, planner.grid, jnp.asarray(g))[0]
    )
    ew = np.asarray(
        sweeps.compute_edge_weights(mesh, jnp.asarray(costs_np), 1.0)
    )
    adj = oracle.mesh_adjacency(mesh)
    for b in range(min(8, B)):
        od, _ = oracle.dijkstra_oracle(
            mesh.num_vertices, adj, ew, costs_np, int(gv[b]), 2.0
        )
        fin = np.isfinite(od)
        rel = np.abs(pot[b][fin] - od[fin]) / np.maximum(od[fin], 1e-3)
        assert float(np.percentile(rel, 99.9)) < 0.01, (
            f"lane {b}: p99.9 rel err {np.percentile(rel, 99.9):.3e}"
        )
