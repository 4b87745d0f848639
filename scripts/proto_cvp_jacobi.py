"""Round 5 prototype: CVP eikonal GS-prefix + XLA-Jacobi refinement tail.

The chunked-GS pass buys full 2D freshness (long-range transport in one
ordering) at ~8x the tile-op cost of a full-slab vectorized pass. After the
first rounds the remaining work is LOCAL corner-cut refinement — hypothesis:
a cheap full-slab Jacobi round (the exact unfolding update, vertical
carry-free, lateral reach 1/round) can finish the job. Measures: GS-prefix
time, Jacobi round count + time, p99.9 parity vs the native CVP FMM oracle.

Usage: python scripts/proto_cvp_jacobi.py [mesh_n=1024] [B=128] [gs_rounds=2]
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

INF = jnp.inf
mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
GS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
ATOL, RTOL = 1e-4, 1e-3

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
g_c = jnp.asarray(p[B:])


def locate(goals):
    def lg(g):
        g_face, _, _, g_found = query.containing_face(mesh, grid, g)
        g_vids = mesh.faces[jnp.maximum(g_face, 0)]
        seed_d = jnp.linalg.norm(mesh.vertices[g_vids] - g, axis=-1)
        return g_vids, seed_d.astype(jnp.float32), g_found
    return jax.vmap(lg)(goals)


g_vids, seed_d, _ = jax.jit(locate)(g_c)
jax.block_until_ready(g_vids)

R, C, Cp = plan.n_rows, plan.n_cols, plan.n_cols_pad
K = len(plan.classes)

# native oracle on 2 lanes
nm = native.NativeMesh(vpos, host_array(mesh, "faces"))
gvid_np = np.asarray(g_vids)
gpos = np.asarray(g_c)
ods = []
for b in range(2):
    sd = np.linalg.norm(vpos[gvid_np[b]] - gpos[b][None, :], axis=1).astype(np.float32)
    od, _, _ = nm.cvp(ew_np, costs_np, gvid_np[b], sd, 2.0)
    ods.append(od)


def parity(d_pad, tag):
    pot = np.asarray(d_pad[:R, :C, :B].reshape(R * C, B)[:V].T)
    errs = []
    for b in range(2):
        od = ods[b]
        fin = np.isfinite(od)
        rel = np.abs(pot[b][fin] - od[fin]) / np.maximum(od[fin], 1e-3)
        errs.append(float(np.percentile(rel, 99.9)))
    print(f"{tag:28s} p99.9={max(errs):.2e}", flush=True)


def gs_prefix(gv, sd, mr):
    dres = _pb.banded_solve_padded(dp, gv[:, 0], max_rounds=64,
                                   atol=1e-4, rtol=2e-3)
    Rd, Cd = dp.n_rows, dp.n_cols
    dij_vb = dres.d_pad[:Rd, :Cd, :B].reshape(Rd * Cd, B)[:V]
    init = jnp.where(tok[:, None], dij_vb + sd[:, 0][None, :], jnp.inf)
    return pe.eikonal_solve_padded(plan, gv, sd, init_vb=init, atol=ATOL,
                                   rtol=RTOL, cw=8, n_inner=8, orderings=2,
                                   max_rounds=mr)


fn_gs = jax.jit(gs_prefix, static_argnames=("mr",))
res_full = fn_gs(g_vids, seed_d, 64)
jax.block_until_ready(res_full.d_pad)
t = time.time()
res_full = fn_gs(g_vids, seed_d, 64)
jax.block_until_ready(res_full.d_pad)
print(f"GS full: {(time.time()-t)*1000:.0f} ms rounds={int(res_full.rounds)}",
      flush=True)
parity(np.asarray(res_full.d_pad), "GS full")

res_gs = fn_gs(g_vids, seed_d, GS)
jax.block_until_ready(res_gs.d_pad)
t = time.time()
res_gs = fn_gs(g_vids, seed_d, GS)
jax.block_until_ready(res_gs.d_pad)
t_gs = time.time() - t
print(f"GS prefix({GS}): {t_gs*1000:.0f} ms rounds={int(res_gs.rounds)}",
      flush=True)
parity(np.asarray(res_gs.d_pad), f"GS prefix({GS})")

abc_dev = jnp.pad(
    plan.abc, [(0, res_gs.d_pad.shape[0] - plan.abc.shape[0]), (0, 0), (0, 0)],
    constant_values=INF,
)                                                   # [Rp, 3K, Cp]


def shift3(x, dr, dc):
    # [Rp, Cp, Bp] pad-shift with INF fill: result[r, c] = x[r + dr, c + dc]
    if dr:
        pw = ((0, -dr) if dr < 0 else (dr, 0), (0, 0), (0, 0))
        x = jnp.pad(x, pw, constant_values=INF)
        x = x[dr:] if dr > 0 else x[:dr]
    if dc:
        pw = ((0, 0), (0, -dc) if dc < 0 else (dc, 0), (0, 0))
        x = jnp.pad(x, pw, constant_values=INF)
        x = x[:, dc:] if dc > 0 else x[:, :dc]
    return x


def jacobi_once(d):
    out = d
    for k, (dr1, dc1, dr2, dc2) in enumerate(plan.classes):
        u1 = shift3(d, dr1, dc1)
        u2 = shift3(d, dr2, dc2)
        a = abc_dev[:, 3 * k + 0, :][:, :, None]
        b = abc_dev[:, 3 * k + 1, :][:, :, None]
        c = abc_dev[:, 3 * k + 2, :][:, :, None]
        cand = pe.unfolding_value(u1, u2, a, b, c, c < INF)
        out = jnp.minimum(out, cand)
    changed = jnp.any(out * (1.0 + RTOL) + ATOL < d)
    return out, changed


def tail(d):
    def body(carry):
        d, it, _ = carry
        d2, ch = jacobi_once(d)
        return d2, it + 1, ch

    d1, ch0 = jacobi_once(d)
    return jax.lax.while_loop(
        lambda c: c[2] & (c[1] < jnp.int32(64)), body, (d1, jnp.int32(1), ch0)
    )


fn_tail = jax.jit(tail)
d_t, it_t, ch_t = fn_tail(res_gs.d_pad)
jax.block_until_ready(d_t)
t = time.time()
d_t, it_t, ch_t = fn_tail(res_gs.d_pad)
jax.block_until_ready(d_t)
t_tail = time.time() - t
print(f"Jacobi tail: {t_tail*1000:.0f} ms rounds={int(it_t)} "
      f"converged={not bool(ch_t)}", flush=True)
parity(np.asarray(d_t), f"GS({GS})+Jacobi")
print(f"TOTAL hybrid: {(t_gs+t_tail)*1000:.0f} ms "
      f"(vs GS-full above)", flush=True)
