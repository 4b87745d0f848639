"""Round 5: where does the banded CVP 1M field deviate >1% from native FMM?
Error percentiles + location (distance-from-goal) profile of bad vertices.
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
from mesh_navigation_tpu.mesh import build_mesh, query, synthetic
from mesh_navigation_tpu.mesh.arrays import host_array
from mesh_navigation_tpu.planners import CVPPlanner

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
B = 128

v, f = synthetic.terrain_mesh(
    mesh_n, mesh_n, spacing=0.5, hills=2.0, roughness=0.01, seed=0
)
mesh = build_mesh(v, f)
nz = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1, 1)
costs_np = np.arccos(nz).astype(np.float32)
edges = host_array(mesh, "edges")
dist = host_array(mesh, "edge_dist")
c1, c2 = costs_np[edges[:, 0]], costs_np[edges[:, 1]]
ew_np = np.where(
    np.isfinite(c1) & np.isfinite(c2),
    dist + dist * (c1 + c2) * 0.5, np.inf
).astype(np.float32)

grid = query.build_grid(mesh)
cvp = CVPPlanner(mesh, PlannerConfig(cost_limit=2.0), grid=grid,
                 max_path_len=max(2048, 3 * mesh_n))
ckplan = cvp.prepare_eikonal_plan(ew_np, costs_np)
ew_dev = jnp.asarray(ew_np)
dij_plan = cvp._dij_plan
vpos = host_array(mesh, "vertices")
rng = np.random.default_rng(0)
ids = rng.integers(0, mesh.num_vertices, 2 * B)
p = vpos[ids].astype(np.float32)
s_c, g_c = jnp.asarray(p[:B]), jnp.asarray(p[B:])

out = cvp.plan_batch_banded(ew_dev, ckplan, s_c, g_c, warm_plan=dij_plan)
jax.block_until_ready(out.cost)
pot = np.asarray(out.potential)

nm = native.NativeMesh(vpos, host_array(mesh, "faces"))
faces_np = host_array(mesh, "faces")
gl = jax.vmap(lambda g: query.containing_face(mesh, grid, g)[0])(g_c)
gvid = faces_np[np.maximum(np.asarray(gl), 0)]
gpos = np.asarray(g_c)
for b in range(2):
    sd = np.linalg.norm(vpos[gvid[b]] - gpos[b][None, :], axis=1).astype(np.float32)
    od, _, _ = nm.cvp(ew_np, costs_np, gvid[b], sd, 2.0)
    fin = np.isfinite(od)
    rel = np.abs(pot[b][fin] - od[fin]) / np.maximum(od[fin], 1e-3)
    odf = od[fin]
    got = pot[b][fin]
    qs = [50, 90, 99, 99.9, 99.99, 100]
    print(f"lane {b}: " + " ".join(
        f"p{q}={np.percentile(rel, q):.2e}" for q in qs), flush=True)
    bad = rel > 0.01
    print(
        f"  bad>1%: {bad.sum()} vertices; od range "
        f"[{odf[bad].min() if bad.any() else 0:.3f}, "
        f"{odf[bad].max() if bad.any() else 0:.3f}]; "
        f"signed err mean {np.mean((got-odf)[bad]) if bad.any() else 0:+.4f}",
        flush=True,
    )
    # are they clustered near the goal?
    if bad.any():
        gd = np.linalg.norm(vpos[fin][bad] - gpos[b][None, :], axis=1)
        print(f"  bad euclid-to-goal: min {gd.min():.2f} med "
              f"{np.median(gd):.2f} max {gd.max():.2f}", flush=True)
