"""Ad-hoc: why does the irregular banded solve need ~38 rounds?

Isolates variables on the real chip: batch size, goal sorting, skip on/off,
extended lanes on/off, plus a host-side audit of broken lateral chains
before/after detour repair.
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
plan_nox = pb.build_banded_kernel_plan(mesh, W_np, extended=False)
print(
    f"# V={V} cov={plan.coverage:.4f} res={plan.n_residual} "
    f"xlanes_down={plan.xlanes_down} xlanes_up={plan.xlanes_up}",
    flush=True,
)

# host audit: broken lateral links before/after detour repair
lat = np.asarray(plan.lat_fwd)[:, : plan.n_cols - 1]
eff = np.asarray(plan.a_fwd[:, 0, :])[:, : plan.n_cols - 1]
R = plan.n_rows
real_rows = (np.arange(R) * plan.n_cols < V - plan.n_cols)
broken_direct = ~np.isfinite(lat[real_rows, 1:])
broken_eff = ~np.isfinite(eff[real_rows, 1:])
print(
    f"# lateral links: broken direct {broken_direct.mean():.4f}, "
    f"after detour {broken_eff.mean():.4f}",
    flush=True,
)

rng = np.random.default_rng(0)


def run(name, plan_in, B, sort=True, skip=None, n_it=2):
    fn = jax.jit(
        lambda s: pb.banded_solve_padded(plan_in, s, skip_rows=skip)
    )
    rlist = []
    t1 = None
    for i in range(n_it + 1):
        seeds = jnp.asarray(rng.integers(0, V, size=B), jnp.int32)
        if sort:
            seeds = jnp.sort(seeds)
        out = fn(seeds)
        jax.block_until_ready(out)
        if i == 0:
            t1 = time.time()
        rlist.append(int(out.rounds))
    dt = (time.time() - t1) / n_it
    print(f"{name:34s}: {dt*1000:8.1f} ms rounds={rlist}", flush=True)


run("B=256 sorted (baseline)", plan, 256)
run("B=16 sorted", plan, 16)
run("B=1", plan, 1)
run("B=256 unsorted", plan, 256, sort=False)
run("B=256 no-skip", plan, 256, skip=False)
run("B=256 no-xlanes", plan_nox, 256)
