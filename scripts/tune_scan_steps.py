"""Ad-hoc: sweep the banded kernel's scan depth on the real chip.

Usage: python scripts/tune_scan_steps.py [mesh_n] [batch] [steps...]
Times banded_solve_padded at each scan depth (0 = plan full depth) on both a
grid terrain and (with IRREGULAR=1) a jittered-Delaunay mesh; reports
ms/solve + rounds so the bench default can be picked from data.
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

from mesh_navigation_tpu.mesh import build_mesh, reorder, synthetic
from mesh_navigation_tpu.mesh.arrays import host_array
from mesh_navigation_tpu.ops import pallas_banded as pb
from mesh_navigation_tpu.ops import sweeps

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
steps_list = [int(x) for x in sys.argv[3:]] or [0, 3, 4, 5, 6, 8]
dtype = jnp.bfloat16 if os.environ.get("DTYPE") == "bf16" else jnp.float32


def bench_mesh(mesh, label):
    nz = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1, 1)
    costs_np = np.arccos(nz).astype(np.float32)
    W_np = sweeps.slot_weights_np(mesh, costs_np, cost_limit=2.0, edge_cost_factor=1.0)
    plan = pb.build_banded_kernel_plan(mesh, W_np)
    print(
        f"# [{label}] V={mesh.num_vertices} cov={plan.coverage:.4f} "
        f"n_res={plan.n_residual} n_scan={plan.n_scan}",
        flush=True,
    )
    rng = np.random.default_rng(0)
    SEEDS = [
        jnp.sort(jnp.asarray(rng.integers(0, mesh.num_vertices, B), jnp.int32))
        for _ in range(5)
    ]
    for steps in steps_list:
        fn = jax.jit(
            lambda s, st=steps: pb.banded_solve_padded(
                plan, s, dtype=dtype, scan_steps=st
            )
        )
        out = fn(SEEDS[0])
        jax.block_until_ready(out)
        t1 = time.time()
        n_it = 4
        for i in range(n_it):
            out = fn(SEEDS[(i + 1) % len(SEEDS)])
        jax.block_until_ready(out)
        dt = (time.time() - t1) / n_it
        print(
            f"[{label}] scan_steps={steps:2d}: {dt*1000:7.2f} ms  "
            f"rounds={int(out.rounds)} converged={bool(out.converged)}",
            flush=True,
        )


t0 = time.time()
v, f = synthetic.terrain_mesh(mesh_n, mesh_n, spacing=0.5, hills=2.0, roughness=0.01, seed=0)
bench_mesh(build_mesh(v, f), "grid")
if os.environ.get("IRREGULAR", "1") == "1":
    vi, fi = synthetic.irregular_terrain_mesh(
        mesh_n, mesh_n, spacing=0.5, jitter=0.45, hills=2.0, roughness=0.01, seed=1
    )
    bench_mesh(reorder.build_reordered_mesh(vi, fi), "irr")
print(f"# total {time.time()-t0:.1f}s", flush=True)
