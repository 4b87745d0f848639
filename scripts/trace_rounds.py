"""Ad-hoc: watch the irregular wavefront grow round by round.

For k = 1..N solve with max_rounds=k and report how many labels are finite
and the max |label| reached — distinguishes 'slow everywhere' from 'stalls
at specific frontiers'.
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

from mesh_navigation_tpu.mesh import reorder, synthetic
from mesh_navigation_tpu.mesh.arrays import host_array
from mesh_navigation_tpu.ops import pallas_banded as pb
from mesh_navigation_tpu.ops import sweeps

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
vi, fi = synthetic.irregular_terrain_mesh(
    mesh_n, mesh_n, spacing=0.5, jitter=0.45, hills=2.0, roughness=0.01, seed=1
)
mesh = reorder.build_reordered_mesh(vi, fi)
V = mesh.num_vertices
nz = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1, 1)
costs_np = np.arccos(nz).astype(np.float32)
W_np = sweeps.slot_weights_np(mesh, costs_np, cost_limit=2.0, edge_cost_factor=1.0)
plan = pb.build_banded_kernel_plan(mesh, W_np)
R, C, Cp = plan.n_rows, plan.n_cols, plan.n_cols_pad

seed = jnp.asarray([V // 2 + C // 2], jnp.int32)   # center
prev_n = 0
for k in (1, 2, 3, 4, 6, 8, 12, 16, 20, 25, 30, 40):
    fn = jax.jit(lambda s, kk=k: pb.banded_solve_padded(plan, s, max_rounds=kk))
    res = fn(seed)
    d = np.asarray(res.d_pad[:R, :C, 0].reshape(-1)[:V])
    fin = np.isfinite(d)
    n = int(fin.sum())
    # frontier rows: rows not yet fully finite
    rows_fin = fin[: (V // C) * C].reshape(-1, C).all(axis=1)
    print(
        f"k={k:3d}: finite {n:7d} (+{n-prev_n:6d}) rows complete "
        f"{int(rows_fin.sum())}/{V//C} max {np.nanmax(np.where(fin, d, np.nan)):7.1f} "
        f"rounds={int(res.rounds)} conv={bool(res.converged)}",
        flush=True,
    )
    prev_n = n
    if bool(res.converged):
        break
