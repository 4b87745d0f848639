"""Round 5: reproduce + bisect the BENCH_r04 irregular parity failure.

BENCH_r04 measured max rel err 4.45e+01 on the 1M jittered-Delaunay mesh at
the bench configuration (atol=1e-3, rtol=2e-3, B=512, int8 class preds,
8 oracle lanes). r3 measured 0.61% at (atol=1e-5?, B=256, 2 lanes).

This script reproduces at mid scale and bisects the candidate knobs:
  (a) atol 1e-3 vs 1e-5
  (b) batch 512 vs 256
  (c) solve path: plan_batch_banded (light) vs raw banded_solve_padded field
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from mesh_navigation_tpu import native
from mesh_navigation_tpu.config import PlannerConfig
from mesh_navigation_tpu.mesh import build_mesh, query, reorder, synthetic
from mesh_navigation_tpu.mesh.arrays import host_array
from mesh_navigation_tpu.ops import pallas_banded as pb
from mesh_navigation_tpu.ops import sweeps
from mesh_navigation_tpu.planners.dijkstra import DijkstraPlanner

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 512

t0 = time.time()
vi, fi = synthetic.irregular_terrain_mesh(
    mesh_n, mesh_n, spacing=0.5, jitter=0.45, hills=2.0, roughness=0.01, seed=1
)
mesh = reorder.build_reordered_mesh(vi, fi)
V = mesh.num_vertices
print(f"# mesh {V}v {mesh.num_faces}f in {time.time()-t0:.1f}s", flush=True)

nz = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1, 1)
costs_np = np.arccos(nz).astype(np.float32)
W_np = sweeps.slot_weights_np(mesh, costs_np, cost_limit=2.0, edge_cost_factor=1.0)

planner = DijkstraPlanner(
    mesh, PlannerConfig(method="batched", ordered_rounds=0, cost_limit=2.0),
    max_path_len=max(2048, 3 * mesh_n),
)
kplan = planner.prepare_banded_plan(W_np)
print(f"# plan cov={kplan.coverage:.4f} n_res={kplan.n_residual}", flush=True)

# oracle edge weights
edges = host_array(mesh, "edges")
dist = host_array(mesh, "edge_dist")
c1, c2 = costs_np[edges[:, 0]], costs_np[edges[:, 1]]
ew_np = np.where(
    np.isfinite(c1) & np.isfinite(c2),
    dist + 1.0 * dist * (c1 + c2) * 0.5, np.inf
).astype(np.float32)
nm = native.NativeMesh(host_array(mesh, "vertices"), host_array(mesh, "faces"))

rng = np.random.default_rng(0)
extent = mesh_n * 0.5 - 1.0


def scen(batch):
    s = rng.uniform(1, extent, size=(batch, 3)).astype(np.float32)
    g = rng.uniform(1, extent, size=(batch, 3)).astype(np.float32)
    s[:, 2] = 0.0
    g[:, 2] = 0.0
    return jnp.asarray(s), jnp.asarray(g)


def check(tag, batch, atol, rtol, lanes=8):
    starts, goals = scen(batch)
    fn = jax.jit(
        lambda W, kp, s, g: planner.plan_batch_banded(
            W, kp, s, g, light=True, atol=atol, rtol=rtol, grid=planner.grid,
        ).potential
    )
    t1 = time.time()
    pot = np.asarray(fn(jnp.asarray(W_np), kplan, starts, goals))
    sv = np.asarray(jax.vmap(
        lambda p: query.nearest_vertex(mesh, planner.grid, p)[0])(starts))
    gv = np.asarray(jax.vmap(
        lambda p: query.nearest_vertex(mesh, planner.grid, p)[0])(goals))
    errs = []
    worst = (0.0, -1)
    for b in range(lanes):
        od, _ = nm.dijkstra(ew_np, costs_np, int(gv[b]), 2.0)
        fin = np.isfinite(od)
        rel = np.abs(pot[b][fin] - od[fin]) / np.maximum(od[fin], 1e-3)
        p999 = float(np.percentile(rel, 99.9))
        mx = float(rel.max())
        errs.append(p999)
        if mx > worst[0]:
            worst = (mx, b)
    print(
        f"{tag:40s}: p99.9 max={max(errs):.3e} abs-max={worst[0]:.3e} "
        f"(lane {worst[1]}) [{time.time()-t1:.1f}s]",
        flush=True,
    )
    return max(errs)


# bench config first (expected to fail if reproducible at this scale)
check("bench cfg: B=512 atol=1e-3 rtol=2e-3", 512, 1e-3, 2e-3)
check("B=512 atol=1e-5 rtol=2e-3", 512, 1e-5, 2e-3)
check("B=512 atol=1e-3 rtol=1e-5", 512, 1e-3, 1e-5)
check("B=256 atol=1e-3 rtol=2e-3", 256, 1e-3, 2e-3)
check("B=512 tight (1e-5/1e-5)", 512, 1e-5, 1e-5)
