"""Ad-hoc: check-certificate kernel block-size sweep at 1M, B=128.

The warm resolve pays one check per update; at rb=4 (the pred-block picker)
the up/dn halo streams re-read ~50% of the field. Sweep rb with a raised
per-kernel VMEM limit.

Usage: python scripts/tune_check.py [mesh_n] [B]
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
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128

t0 = time.time()
v, f = synthetic.terrain_mesh(mesh_n, mesh_n, spacing=0.5, hills=2.0,
                              roughness=0.01, seed=0)
mesh = build_mesh(v, f)
V = mesh.num_vertices
nz = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1, 1)
costs_np = np.arccos(nz).astype(np.float32)
W_np = sweeps.slot_weights_np(mesh, costs_np, cost_limit=2.0,
                              edge_cost_factor=1.0)
plan = pb.build_banded_kernel_plan(mesh, W_np)
rng = np.random.default_rng(0)
seeds = jnp.sort(jnp.asarray(rng.integers(0, V, B), jnp.int32))
res = pb.banded_solve_padded(plan, seeds, atol=1e-4, rtol=2e-3)
d = res.d_pad
jax.block_until_ready(d)
Rp, Cp, Bp = d.shape
print(f"# field {Rp}x{Cp}x{Bp}, built {time.time()-t0:.0f}s", flush=True)

w8 = pb._w8_planes(plan, Rp)
jax.block_until_ready(w8)

for rb in (4, 8, 16, 32):
    if Rp % rb:
        continue
    try:
        fn = jax.jit(lambda dd, rb=rb: pb._check_pallas_padded(
            dd, w8, rb=rb, bb=128, atol=1e-4, rtol=2e-3))
        out = fn(d)
        jax.block_until_ready(out)
        t1 = time.time()
        for _ in range(8):
            out = fn(d)
        jax.block_until_ready(out)
        dt = (time.time() - t1) / 8
        gb = (Rp * Cp * Bp * 4 + (Rp // rb) * 2 * Cp * Bp * 4
              + Rp * 8 * Cp * 4) / 1e9
        print(f"rb={rb:3d}: {dt*1000:7.2f} ms  ({gb/dt:.0f} GB/s incl halos)",
              flush=True)
    except Exception as e:
        print(f"rb={rb:3d}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
print(f"# total {time.time()-t0:.0f}s", flush=True)
