"""Round 5: CVP at-scale tuning — split the warm-dij vs eikonal-round cost,
and find the cheapest configuration whose field stays inside the 1% oracle
gate (rtol 2e-3 measured +1.5%: sub-tolerance far-field compounding).
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
from mesh_navigation_tpu.ops import pallas_banded as _pb
from mesh_navigation_tpu.ops import pallas_eikonal as pe
from mesh_navigation_tpu.planners import CVPPlanner

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128

v, f = synthetic.terrain_mesh(mesh_n, mesh_n, spacing=0.5, hills=2.0,
                              roughness=0.01, seed=0)
mesh = build_mesh(v, f)
V = mesh.num_vertices
nz = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1, 1)
costs_np = np.arccos(nz).astype(np.float32)
edges = host_array(mesh, "edges")
dist = host_array(mesh, "edge_dist")
c1, c2 = costs_np[edges[:, 0]], costs_np[edges[:, 1]]
ew_np = np.where(np.isfinite(c1) & np.isfinite(c2),
                 dist + dist * (c1 + c2) * 0.5, np.inf).astype(np.float32)
grid = query.build_grid(mesh)
cvp = CVPPlanner(mesh, PlannerConfig(cost_limit=2.0), grid=grid,
                 max_path_len=max(2048, 3 * mesh_n))
plan = cvp.prepare_eikonal_plan(ew_np, costs_np)
dp = cvp._dij_plan
tok = cvp._target_ok
vpos = host_array(mesh, "vertices")
rng = np.random.default_rng(0)
ids = rng.integers(0, V, 2 * B)
p = vpos[ids].astype(np.float32)
s_c, g_c = jnp.asarray(p[:B]), jnp.asarray(p[B:])


def locate(goals):
    def lg(g):
        g_face, _, _, g_found = query.containing_face(mesh, grid, g)
        g_vids = mesh.faces[jnp.maximum(g_face, 0)]
        seed_d = jnp.linalg.norm(mesh.vertices[g_vids] - g, axis=-1)
        return g_vids, seed_d.astype(jnp.float32), g_found
    return jax.vmap(lg)(goals)


g_vids, seed_d, g_found = jax.jit(locate)(g_c)
jax.block_until_ready(g_vids)

# stage A: warm dijkstra solve alone
dfn = jax.jit(lambda gv: _pb.banded_solve_padded(
    dp, gv[:, 0], max_rounds=64, atol=1e-4, rtol=2e-3).d_pad)
dres = dfn(g_vids)
jax.block_until_ready(dres)
t = time.time()
for _ in range(3):
    dres = dfn(g_vids)
jax.block_until_ready(dres)
print(f"warm dij solve: {(time.time()-t)/3*1000:.1f} ms", flush=True)

# oracle for parity
nm = native.NativeMesh(vpos, host_array(mesh, "faces"))
faces_np = host_array(mesh, "faces")
gvid_np = np.asarray(g_vids)
gpos = np.asarray(g_c)
ods = []
for b in range(2):
    sd = np.linalg.norm(vpos[gvid_np[b]] - gpos[b][None, :], axis=1).astype(np.float32)
    od, _, _ = nm.cvp(ew_np, costs_np, gvid_np[b], sd, 2.0)
    ods.append(od)


def run(tag, **kw):
    def solve(gv, sd):
        dres = _pb.banded_solve_padded(dp, gv[:, 0], max_rounds=64,
                                       atol=1e-4, rtol=2e-3)
        Rd, Cd = dp.n_rows, dp.n_cols
        dij_vb = dres.d_pad[:Rd, :Cd, :B].reshape(Rd * Cd, B)[:V]
        init = jnp.where(tok[:, None], dij_vb + sd[:, 0][None, :], jnp.inf)
        return pe.eikonal_solve_padded(plan, gv, sd, init_vb=init, **kw)
    fn = jax.jit(solve)
    res = fn(g_vids, seed_d)
    jax.block_until_ready(res.d_pad)
    t = time.time()
    n = 3
    for _ in range(n):
        res = fn(g_vids, seed_d)
    jax.block_until_ready(res.d_pad)
    dt = (time.time() - t) / n
    R, C = plan.n_rows, plan.n_cols
    pot = np.asarray(res.d_pad[:R, :C, :B].reshape(R * C, B)[:V].T)
    errs = []
    for b in range(2):
        od = ods[b]
        fin = np.isfinite(od)
        rel = np.abs(pot[b][fin] - od[fin]) / np.maximum(od[fin], 1e-3)
        errs.append(float(np.percentile(rel, 99.9)))
    print(f"{tag:40s}: {dt*1000:7.1f} ms rounds={int(res.rounds)} "
          f"p99.9={max(errs):.2e}", flush=True)


run("rtol=1e-3 cw8 ni8 o2", atol=1e-4, rtol=1e-3, cw=8, n_inner=8, orderings=2)
run("rtol=2e-3 cw8 ni8 o2", atol=1e-4, rtol=2e-3, cw=8, n_inner=8, orderings=2)
run("rtol=1.5e-3 cw8 ni8 o2", atol=1e-4, rtol=1.5e-3, cw=8, n_inner=8, orderings=2)
run("rtol=1e-3 cw16 ni16 o2", atol=1e-4, rtol=1e-3, cw=16, n_inner=16, orderings=2)
run("rtol=1e-3 cw8 ni8 o1", atol=1e-4, rtol=1e-3, cw=8, n_inner=8, orderings=1)

# hybrid: Sethian rounds + min-plus graph transport between rounds
def run_hybrid(tag, **kw):
    def solve(gv, sd):
        dres = _pb.banded_solve_padded(dp, gv[:, 0], max_rounds=64,
                                       atol=1e-4, rtol=2e-3)
        Rd, Cd = dp.n_rows, dp.n_cols
        dij_vb = dres.d_pad[:Rd, :Cd, :B].reshape(Rd * Cd, B)[:V]
        init = jnp.where(tok[:, None], dij_vb + sd[:, 0][None, :], jnp.inf)
        return pe.eikonal_solve_padded(plan, gv, sd, init_vb=init,
                                       graph_plan=dp, **kw)
    fn = jax.jit(solve)
    res = fn(g_vids, seed_d)
    jax.block_until_ready(res.d_pad)
    t = time.time()
    n = 3
    for _ in range(n):
        res = fn(g_vids, seed_d)
    jax.block_until_ready(res.d_pad)
    dt = (time.time() - t) / n
    R, C = plan.n_rows, plan.n_cols
    pot = np.asarray(res.d_pad[:R, :C, :B].reshape(R * C, B)[:V].T)
    errs = []
    for b in range(2):
        od = ods[b]
        fin = np.isfinite(od)
        rel = np.abs(pot[b][fin] - od[fin]) / np.maximum(od[fin], 1e-3)
        errs.append(float(np.percentile(rel, 99.9)))
    print(f"{tag:40s}: {dt*1000:7.1f} ms rounds={int(res.rounds)} "
          f"p99.9={max(errs):.2e}", flush=True)


if os.environ.get("TUNE_HYBRID", "0") == "1":
    run_hybrid("HYB rtol=1e-3 cw8 ni8 o2", atol=1e-4, rtol=1e-3, cw=8,
               n_inner=8, orderings=2)
    run_hybrid("HYB rtol=1e-3 cw8 ni4 o2", atol=1e-4, rtol=1e-3, cw=8,
               n_inner=4, orderings=2)
    run_hybrid("HYB rtol=1e-3 cw8 ni2 o2", atol=1e-4, rtol=1e-3, cw=8,
               n_inner=2, orderings=2)
    run_hybrid("HYB rtol=1e-3 cw16 ni2 o2", atol=1e-4, rtol=1e-3, cw=16,
               n_inner=2, orderings=2)
    run_hybrid("HYB rtol=1e-3 cw32 ni1 o2", atol=1e-4, rtol=1e-3, cw=32,
               n_inner=1, orderings=2)
    run_hybrid("HYB rtol=2e-3 cw8 ni4 o2", atol=1e-4, rtol=2e-3, cw=8,
               n_inner=4, orderings=2)
