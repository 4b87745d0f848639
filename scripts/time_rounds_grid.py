"""Ad-hoc: per-round cost of the banded solve on the 1M grid.

Times banded_solve_padded with max_rounds forced to 1, 2, 3 (same seeds,
bench tolerances) — the deltas separate round-1 full-sweep cost from the
round-2 confirmation pass, which bounds what a cheaper confirm could save.
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

from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.mesh.arrays import host_array
from mesh_navigation_tpu.ops import pallas_banded as pb
from mesh_navigation_tpu.ops import sweeps

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256

v, f = synthetic.terrain_mesh(mesh_n, mesh_n, spacing=0.5, hills=2.0,
                              roughness=0.01, seed=0)
mesh = build_mesh(v, f)
V = mesh.num_vertices
nz = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1, 1)
costs_np = np.arccos(nz).astype(np.float32)
W_np = sweeps.slot_weights_np(mesh, costs_np, cost_limit=2.0,
                              edge_cost_factor=1.0)
plan = pb.build_banded_kernel_plan(mesh, W_np)
print(f"# mesh {V} cov={plan.coverage:.4f} n_res={plan.n_residual}",
      flush=True)

rng = np.random.default_rng(0)
SEEDS = [jnp.sort(jnp.asarray(rng.integers(0, V, B), jnp.int32))
         for _ in range(4)]

for k in (1, 2, 3):
    fn = jax.jit(lambda s, kk=k: pb.banded_solve_padded(
        plan, s, max_rounds=kk, atol=1e-4, rtol=1e-3))
    r = fn(SEEDS[0]); jax.block_until_ready(r.d_pad)
    t = time.time()
    for i in range(3):
        r = fn(SEEDS[(i + 1) % 4])
    jax.block_until_ready(r.d_pad)
    dt = (time.time() - t) / 3
    print(f"max_rounds={k}: {dt*1000:7.2f} ms  rounds={int(r.rounds)} "
          f"converged={bool(r.converged)}", flush=True)
