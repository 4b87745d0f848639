"""Round 5: verify the CVP at-scale path compiles and runs at 1M (the r4
bench stage died on remote-compile HTTP 413 — mesh-sized closure constants
in the serialized HLO). After the fix every mesh-sized table rides as a jit
argument of _plan_batch_banded_impl.

Mirrors the bench CVP stage exactly (bench.py cvp stage), standalone.
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
from mesh_navigation_tpu.ops import sweeps
from mesh_navigation_tpu.planners import CVPPlanner

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128

t0 = time.time()
v, f = synthetic.terrain_mesh(
    mesh_n, mesh_n, spacing=0.5, hills=2.0, roughness=0.01, seed=0
)
mesh = build_mesh(v, f)
print(f"# mesh {mesh.num_vertices}v ({time.time()-t0:.1f}s)", flush=True)

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
cvp = CVPPlanner(
    mesh, PlannerConfig(cost_limit=2.0), grid=grid,
    max_path_len=max(2048, 3 * mesh_n),
)
t1 = time.time()
ckplan = cvp.prepare_eikonal_plan(ew_np, costs_np)
print(
    f"# plan cov={ckplan.coverage:.4f} classes={len(ckplan.classes)} "
    f"n_res={ckplan.n_residual} ({time.time()-t1:.1f}s)", flush=True,
)
ew_dev = jnp.asarray(ew_np)
dij_plan = cvp._dij_plan
vpos = host_array(mesh, "vertices")
rng = np.random.default_rng(0)


def sample():
    ids = rng.integers(0, mesh.num_vertices, 2 * B)
    p = vpos[ids].astype(np.float32)
    return jnp.asarray(p[:B]), jnp.asarray(p[B:])


t2 = time.time()
s_c, g_c = sample()
out = cvp.plan_batch_banded(ew_dev, ckplan, s_c, g_c, warm_plan=dij_plan)
jax.block_until_ready(out.cost)
print(f"# compiled+warm in {time.time()-t2:.1f}s", flush=True)

iters = 4
t3 = time.time()
for _ in range(iters):
    out = cvp.plan_batch_banded(ew_dev, ckplan, *sample(), warm_plan=dij_plan)
jax.block_until_ready(out.cost)
dt = time.time() - t3
sps = B * iters / dt
reach = float(np.isfinite(np.asarray(out.cost)).mean())
print(f"# {B*iters} solves in {dt:.3f}s ({sps:.1f}/s, reach {reach:.3f})",
      flush=True)

# parity vs the native FMM oracle on 2 lanes — re-solve on (s_c, g_c) so
# the checked potential corresponds to the checked goals (the timing loop's
# `out` belongs to its own last draw)
out = cvp.plan_batch_banded(ew_dev, ckplan, s_c, g_c, warm_plan=dij_plan)
jax.block_until_ready(out.cost)
if native.available():
    nm = native.NativeMesh(vpos, host_array(mesh, "faces"))
    gl = jax.vmap(lambda g: query.containing_face(mesh, grid, g)[0])(g_c)
    faces_np = host_array(mesh, "faces")
    gvid = faces_np[np.maximum(np.asarray(gl), 0)]
    gpos = np.asarray(g_c)
    pot = np.asarray(out.potential)
    errs = []
    for b in range(2):
        sd = np.linalg.norm(vpos[gvid[b]] - gpos[b][None, :], axis=1).astype(
            np.float32
        )
        od, _, _ = nm.cvp(ew_np, costs_np, gvid[b], sd, 2.0)
        fin = np.isfinite(od)
        rel = np.abs(pot[b][fin] - od[fin]) / np.maximum(od[fin], 1e-3)
        errs.append(float(np.percentile(rel, 99.9)))
    print(f"# cvp oracle parity p99.9 max {max(errs):.3e} over 2 lanes",
          flush=True)
