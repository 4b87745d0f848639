"""Ad-hoc: stage breakdown of the CVP at-scale path (plan_batch_banded).

Usage: python scripts/profile_cvp.py [mesh_n] [batch]
Stages: locate goals -> eikonal_solve_padded (by round count) ->
cvp_descend_paths -> pose chain.
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

from mesh_navigation_tpu.config import PlannerConfig
from mesh_navigation_tpu.mesh import build_mesh, query, synthetic
from mesh_navigation_tpu.mesh.arrays import host_array
from mesh_navigation_tpu.ops import pallas_eikonal as pe
from mesh_navigation_tpu.planners import CVPPlanner

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128

t0 = time.time()
v, f = synthetic.terrain_mesh(mesh_n, mesh_n, spacing=0.5, hills=2.0, roughness=0.01, seed=0)
mesh = build_mesh(v, f)
V = mesh.num_vertices
nz = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1, 1)
costs_np = np.arccos(nz).astype(np.float32)

from mesh_navigation_tpu.ops import sweeps as _sweeps

edges = host_array(mesh, "edges")
dist = host_array(mesh, "edge_dist")
c1, c2 = costs_np[edges[:, 0]], costs_np[edges[:, 1]]
ew_np = np.where(
    np.isfinite(c1) & np.isfinite(c2),
    dist + 1.0 * dist * (c1 + c2) * 0.5, np.inf,
).astype(np.float32)

cvp = CVPPlanner(mesh, PlannerConfig(cost_limit=2.0), max_path_len=max(2048, 3 * mesh_n))
t1 = time.time()
plan = cvp.prepare_eikonal_plan(ew_np, costs_np, warm_start=True)
print(f"# eik plan cov={plan.coverage:.4f} classes={len(plan.classes)} "
      f"n_res={plan.n_residual} (build {time.time()-t1:.1f}s)", flush=True)

rng = np.random.default_rng(0)
vpos = host_array(mesh, "vertices")


def sample():
    ids = rng.integers(0, V, 2 * B)
    p = vpos[ids].astype(np.float32)
    return jnp.asarray(p[:B]), jnp.asarray(p[B:])


ARGS = [sample() for _ in range(3)]


def timeit(name, fn, inputs, n_it=2):
    out = fn(*inputs[0])
    jax.block_until_ready(out)
    tc = time.time() - t0
    t1 = time.time()
    for i in range(n_it):
        out = fn(*inputs[(i + 1) % len(inputs)])
    jax.block_until_ready(out)
    dt = (time.time() - t1) / n_it
    print(f"{name:30s}: {dt*1000:8.2f} ms   (compiled by {tc:.0f}s)", flush=True)
    return out


# stage 1: locate goals + seeds
def locate(goals):
    def locate_goal(g):
        g_face, _, _, g_found = query.containing_face(mesh, cvp.grid, g)
        g_vids = mesh.faces[jnp.maximum(g_face, 0)]
        seed_d = jnp.linalg.norm(mesh.vertices[g_vids] - g, axis=-1)
        return g_vids, seed_d.astype(jnp.float32), g_found
    return jax.vmap(locate_goal)(goals)

loc = jax.jit(locate)
g_vids, seed_d, g_found = timeit("locate goals", loc, [(a[1],) for a in ARGS])

# stage 2: eikonal solve (cold vs dijkstra-warm-started)
if os.environ.get("PROF_COLD", "0") == "1":
    solve = jax.jit(lambda gv, sd: pe.eikonal_solve_padded(plan, gv, sd, atol=1e-4, rtol=1e-3))
    res = timeit("eikonal solve (cold)", solve, [(g_vids, seed_d)] * 2)
    print(f"    rounds={int(res.rounds)} converged={bool(res.converged)}", flush=True)

from mesh_navigation_tpu.ops import pallas_banded as _pb

dp = cvp._dij_plan
assert dp is not None

def wsolve(gv, sd):
    dres = _pb.banded_solve_padded(dp, gv[:, 0], max_rounds=64, atol=1e-4, rtol=2e-3)
    Rd, Cd = dp.n_rows, dp.n_cols
    dij_vb = dres.d_pad[:Rd, :Cd, :B].reshape(Rd * Cd, B)[:V]
    init = jnp.where(cvp._target_ok[:, None], dij_vb + sd[:, 0][None, :], jnp.inf)
    return pe.eikonal_solve_padded(plan, gv, sd, atol=1e-4, rtol=1e-3, init_vb=init)

import gc
res = None
for cw, ninner, orderings in [(8, 8, 2), (8, 8, 4)]:
    del res
    gc.collect()
    def wsolve2(gv, sd, cw=cw, ninner=ninner, o=orderings):
        dres = _pb.banded_solve_padded(dp, gv[:, 0], max_rounds=64, atol=1e-4, rtol=2e-3)
        Rd, Cd = dp.n_rows, dp.n_cols
        dij_vb = dres.d_pad[:Rd, :Cd, :B].reshape(Rd * Cd, B)[:V]
        init = jnp.where(cvp._target_ok[:, None], dij_vb + sd[:, 0][None, :], jnp.inf)
        return pe.eikonal_solve_padded(plan, gv, sd, atol=1e-4, rtol=2e-3,
                                       init_vb=init, cw=cw, n_inner=ninner,
                                       orderings=o)
    wf = jax.jit(wsolve2)
    res = timeit(f"warm eik cw={cw} ni={ninner} o={orderings}", wf, [(g_vids, seed_d)] * 2)
    print(f"    rounds={int(res.rounds)} converged={bool(res.converged)}", flush=True)

# stage 3: descent paths
R, C, Cp = plan.n_rows, plan.n_cols, plan.n_cols_pad
dist_bv = jax.jit(
    lambda d: d[:R, :C, :B].reshape(R * C, B)[:V].T
)(res.d_pad)
jax.block_until_ready(dist_bv)
ew_dev = jnp.asarray(ew_np)
start_v = jax.jit(lambda s: query.nearest_vertex_batch(mesh, cvp.grid, s)[0])(ARGS[0][0])
lane = jnp.arange(B)
seed_mask = jnp.zeros((B, V), bool).at[lane[:, None], g_vids].set(True)
desc = jax.jit(lambda d, sv, sm: pe.cvp_descend_paths(
    mesh, ew_dev, d, sv, sm, cvp.max_path_len, tol=5e-3))
path, valid = timeit("cvp_descend_paths", desc, [(dist_bv, start_v, seed_mask)] * 2)

print(f"# total {time.time()-t0:.1f}s", flush=True)
