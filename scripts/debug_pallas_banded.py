"""Granular on-device debug of the banded Pallas kernel: per-phase timing,
round counts, and single-pass timing, at increasing mesh sizes.

Usage: python scripts/debug_pallas_banded.py [mesh_n] [batch] [max_rounds]
Every device call is individually timed and printed so a hang is localized.
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

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
max_rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 8


def t(name, fn, *a, **k):
    t0 = time.time()
    out = fn(*a, **k)
    jax.block_until_ready(out)
    print(f"{name}: {time.time()-t0:.3f}s", flush=True)
    return out


print(f"devices: {jax.devices()}", flush=True)
t0 = time.time()
v, f = synthetic.terrain_mesh(mesh_n, mesh_n, spacing=0.5, hills=2.0, roughness=0.01, seed=0)
mesh = build_mesh(v, f)
print(f"mesh {mesh.num_vertices} vertices ({time.time()-t0:.1f}s)", flush=True)

nz = jnp.clip(mesh.vertex_normals[:, 2], -1.0, 1.0)
costs = jnp.arccos(nz).astype(jnp.float32)
ew = t("edge_weights", sweeps.compute_edge_weights, mesh, costs, 1.0)
W = t("slot_weights", sweeps.slot_weights, mesh, ew, costs, 2.0)

t0 = time.time()
plan = pb.build_banded_kernel_plan(mesh, W)
jax.block_until_ready(plan.a_fwd)
print(
    f"kernel plan: {time.time()-t0:.1f}s coverage={plan.coverage:.4f} "
    f"n_scan={plan.n_scan} R={plan.n_rows} Cp={plan.n_cols_pad}",
    flush=True,
)

rng = np.random.default_rng(0)
seeds = jnp.asarray(rng.integers(0, mesh.num_vertices, size=B), jnp.int32)
d0, down, up, a_f, a_b, rb, bb, xdown, xup = pb.prepare_padded(plan, seeds)
import jax.numpy as _jnp
dirty0 = _jnp.zeros((1, 1), _jnp.int32)
print(f"blocks rb={rb} bb={bb}", flush=True)
interpret = not pb.pallas_available()

# single pass, timed (includes compile on first call)
print("compiling down pass...", flush=True)
d1, chg, _dy = t(
    "down pass (compile+run)",
    pb._directional_pass_pallas,
    d0, down, a_f, a_b, xdown, dirty0,
    reverse=False, rb=rb, bb=bb, n_scan=plan.n_scan, atol=1e-5, rtol=1e-5,
    interpret=interpret,
)
print(f"  changed={bool(chg)}", flush=True)
d2, chg, _dy = t(
    "down pass (warm)",
    pb._directional_pass_pallas,
    d1, down, a_f, a_b, xdown, dirty0,
    reverse=False, rb=rb, bb=bb, n_scan=plan.n_scan, atol=1e-5, rtol=1e-5,
    interpret=interpret,
)
d3, chg, _dy = t(
    "up pass (compile+run)",
    pb._directional_pass_pallas,
    d2, up, a_f, a_b, xup, dirty0,
    reverse=True, rb=rb, bb=bb, n_scan=plan.n_scan, atol=1e-5, rtol=1e-5,
    interpret=interpret,
)

res = t(
    "full solve",
    pb.batched_field_banded_pallas,
    mesh, W, plan, seeds,
    max_rounds=max_rounds,
)
print(f"rounds={int(res.rounds)} converged={bool(res.converged)}", flush=True)

# steady-state throughput
t0 = time.time()
n = 3
for i in range(n):
    res = pb.batched_field_banded_pallas(mesh, W, plan, seeds, max_rounds=max_rounds)
jax.block_until_ready(res.dist)
dt = (time.time() - t0) / n
print(f"steady: {dt*1000:.1f} ms/batch -> {B/dt:.1f} solves/s", flush=True)
