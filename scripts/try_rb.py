"""Ad-hoc: does a larger row block speed the 1M solve?

_pick_blocks' VMEM model yields rb=2 at Cp=1024; this forces rb=4 (and 8)
by patching the picker and times the solve. A Mosaic scoped-vmem overflow
shows up as a compile error — that's the experiment's failure mode, not a
runtime hazard.
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
print(f"# mesh {V} n_res={plan.n_residual}", flush=True)

rng = np.random.default_rng(0)
SEEDS = [jnp.sort(jnp.asarray(rng.integers(0, V, B), jnp.int32))
         for _ in range(4)]

orig_pick = pb._pick_blocks
for rb_force in (0, 4, 8):
    if rb_force:
        pb._pick_blocks = lambda Cp, **kw: (rb_force, 128)
    else:
        pb._pick_blocks = orig_pick
    label = f"rb={rb_force or 'auto'}"
    try:
        fn = jax.jit(lambda s: pb.banded_solve_padded(
            plan, s, max_rounds=64, atol=1e-4, rtol=1e-3))
        r = fn(SEEDS[0]); jax.block_until_ready(r.d_pad)
        t = time.time()
        for i in range(3):
            r = fn(SEEDS[(i + 1) % 4])
        jax.block_until_ready(r.d_pad)
        dt = (time.time() - t) / 3
        print(f"{label}: {dt*1000:7.2f} ms rounds={int(r.rounds)}",
              flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        print(f"{label}: FAILED {msg}", flush=True)
    finally:
        pb._pick_blocks = orig_pick
