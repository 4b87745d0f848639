"""Ad-hoc: how much do late rounds actually improve labels, and what does a
relaxed stopping tolerance buy on irregular meshes?

Runs the irregular 262k solve at several (atol, rtol) and reports rounds,
time, and parity vs the native heap oracle (BASELINE budget: 1% path cost).
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
from mesh_navigation_tpu.mesh import reorder, synthetic
from mesh_navigation_tpu.mesh.arrays import host_array
from mesh_navigation_tpu.ops import pallas_banded as pb
from mesh_navigation_tpu.ops import sweeps

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
vi, fi = synthetic.irregular_terrain_mesh(
    mesh_n, mesh_n, spacing=0.5, jitter=0.45, hills=2.0, roughness=0.01, seed=1
)
mesh = reorder.build_reordered_mesh(vi, fi)
V = mesh.num_vertices
nz = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1, 1)
costs_np = np.arccos(nz).astype(np.float32)
W_np = sweeps.slot_weights_np(mesh, costs_np, cost_limit=2.0, edge_cost_factor=1.0)
plan = pb.build_banded_kernel_plan(mesh, W_np)
R, C = plan.n_rows, plan.n_cols

edges = host_array(mesh, "edges")
edist = host_array(mesh, "edge_dist")
c1, c2 = costs_np[edges[:, 0]], costs_np[edges[:, 1]]
ew_np = np.where(np.isfinite(c1) & np.isfinite(c2),
                 edist + edist * (c1 + c2) * 0.5, np.inf).astype(np.float32)
nm = native.NativeMesh(host_array(mesh, "vertices"), host_array(mesh, "faces"))

rng = np.random.default_rng(0)
seeds_np = np.sort(rng.integers(0, V, size=B)).astype(np.int32)
seeds = jnp.asarray(seeds_np)
oracle0, _ = nm.dijkstra(ew_np, costs_np, int(seeds_np[0]), 2.0)
oracleh, _ = nm.dijkstra(ew_np, costs_np, int(seeds_np[B // 2]), 2.0)

for atol, rtol in ((1e-5, 1e-5), (1e-4, 1e-4), (3e-4, 3e-4), (1e-3, 1e-3),
                   (1e-3, 3e-3)):
    fn = jax.jit(
        lambda s, a=atol, r=rtol: pb.banded_solve_padded(plan, s, atol=a, rtol=r)
    )
    out = fn(seeds)
    jax.block_until_ready(out)
    t1 = time.time()
    for i in range(2):
        out = fn(jnp.asarray(np.sort(rng.integers(0, V, size=B)).astype(np.int32)))
    jax.block_until_ready(out)
    dt = (time.time() - t1) / 2
    out0 = fn(seeds)
    d = np.asarray(out0.d_pad[:R, :C, :B].reshape(R * C, B)[:V])
    errs = []
    for lane, oracle in ((0, oracle0), (B // 2, oracleh)):
        ok = np.isfinite(oracle)
        rel = np.abs(d[:, lane][ok] - oracle[ok]) / np.maximum(oracle[ok], 1e-3)
        errs.append(float(np.nanmax(rel)))
    print(
        f"atol={atol:.0e} rtol={rtol:.0e}: {dt*1000:7.1f} ms "
        f"rounds={int(out0.rounds)} max-rel-err={max(errs):.2e}",
        flush=True,
    )
