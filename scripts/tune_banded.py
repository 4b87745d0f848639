"""Ad-hoc: sweep banded-kernel tunables (n_scan, dtype) at a given scale.

Usage: python scripts/tune_banded.py [mesh_n] [batch] [n_scan,n_scan,...] [f32|bf16|both]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.ops import pallas_banded as pb
from mesh_navigation_tpu.ops import sweeps

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
scans = [int(x) for x in (sys.argv[3].split(",") if len(sys.argv) > 3 else ["0"])]
dtypes = sys.argv[4] if len(sys.argv) > 4 else "f32"

t0 = time.time()
v, f = synthetic.terrain_mesh(mesh_n, mesh_n, spacing=0.5, hills=2.0, roughness=0.01, seed=0)
mesh = build_mesh(v, f)
print(f"# mesh {mesh.num_vertices} vertices ({time.time()-t0:.1f}s)", flush=True)

from mesh_navigation_tpu.mesh.arrays import host_array

nz_np = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1.0, 1.0)
costs_np = np.arccos(nz_np).astype(np.float32)
W_np = sweeps.slot_weights_np(mesh, costs_np, cost_limit=2.0, edge_cost_factor=1.0)
W = jnp.asarray(W_np)

rng = np.random.default_rng(0)
SEEDS = [jnp.asarray(rng.integers(0, mesh.num_vertices, size=B), jnp.int32) for _ in range(4)]

ref = None
for ns in scans:
    plan = pb.build_banded_kernel_plan(mesh, W_np, n_scan=ns)
    for dt_name in (("f32", "bf16") if dtypes == "both" else (dtypes,)):
        dt = jnp.bfloat16 if dt_name == "bf16" else jnp.float32
        fn = jax.jit(lambda s, p=plan, d=dt: pb.batched_field_banded_pallas(
            mesh, W, p, s, dtype=d))
        try:
            out = fn(SEEDS[0])
            jax.block_until_ready(out)
        except Exception as e:
            print(f"n_scan={plan.n_scan} {dt_name}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        t1 = time.time()
        n_it = 3
        for i in range(n_it):
            out = fn(SEEDS[(i + 1) % len(SEEDS)])
        jax.block_until_ready(out)
        dt_s = (time.time() - t1) / n_it
        out0 = fn(SEEDS[0])
        err = ""
        if dt_name == "f32" and ref is None:
            ref = out0.dist  # stays on device: d2h is ~0.2 MB/s over the tunnel
        elif ref is not None:
            d = out0.dist.astype(jnp.float32)
            m = jnp.isfinite(ref) & jnp.isfinite(d) & (ref > 0)
            rel = jnp.where(m, jnp.abs(d - ref), 0.0).max() / jnp.maximum(
                jnp.where(m, ref, 0.0).max(), 1e-9)
            err = f" relerr={float(rel):.2e}"
        print(
            f"n_scan={plan.n_scan} {dt_name}: {dt_s*1000:.1f} ms/batch -> "
            f"{B/dt_s:.0f} solves/s rounds={int(out0.rounds)} "
            f"converged={bool(np.all(out0.converged))}{err}",
            flush=True,
        )
