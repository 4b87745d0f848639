"""Ad-hoc: banded GS vs structured Pallas solver across mesh scales."""
import os, sys, time
import numpy as np
import jax
import jax.numpy as jnp

from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.ops import banded, structured, sweeps

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
which = sys.argv[3] if len(sys.argv) > 3 else "both"

t0 = time.time()
v, f = synthetic.terrain_mesh(mesh_n, mesh_n, spacing=0.5, hills=2.0, roughness=0.01, seed=0)
mesh = build_mesh(v, f)
V = mesh.num_vertices
print(f"# mesh {V} vertices ({time.time()-t0:.1f}s build)", file=sys.stderr)

nz = jnp.clip(mesh.vertex_normals[:, 2], -1.0, 1.0)
costs = jnp.arccos(nz).astype(jnp.float32)
ew = sweeps.compute_edge_weights(mesh, costs, 1.0)
W = sweeps.slot_weights(mesh, ew, costs, 2.0)

rng = np.random.default_rng(0)
SEEDS = [jnp.asarray(rng.integers(0, V, size=B), jnp.int32) for _ in range(8)]
def seeds(i):
    return SEEDS[i % len(SEEDS)]

def timeit(name, fn):
    out = fn(seeds(0))
    jax.block_until_ready(out)
    t1 = time.time()
    n_it = 3
    for i in range(n_it):
        out = fn(seeds(i + 1))
    jax.block_until_ready(out)
    dt = (time.time() - t1) / n_it
    extra = ""
    if hasattr(out, "rounds"):
        extra = f" rounds={int(out.rounds)}"
    if hasattr(out, "sweeps"):
        extra = f" sweeps={int(out.sweeps)}"
    print(f"{name}: {dt*1000:.1f} ms/batch -> {B/dt:.1f} solves/s{extra} "
          f"converged={bool(np.all(out.converged))}")
    return out

res_b = res_s = None
if which in ("both", "banded"):
    plan_b = banded.build_banded_plan(mesh, W)
    print(f"# banded coverage {plan_b.coverage:.4f} n_cols={plan_b.n_cols}", file=sys.stderr)
    fb = jax.jit(lambda s: banded.batched_field_banded(mesh, W, plan_b, s))
    res_b = timeit("banded", fb)
if which in ("both", "structured"):
    plan_s = structured.build_offset_plan(mesh, W)
    fs = jax.jit(lambda s: structured.batched_field_structured(mesh, W, plan_s, s, block_sweeps=16))
    res_s = timeit("structured", fs)
if res_b is not None and res_s is not None:
    d = np.abs(np.asarray(res_b.dist) - np.asarray(res_s.dist))
    fin = np.isfinite(np.asarray(res_s.dist))
    print(f"max |delta| over finite: {d[fin].max():.2e}; inf-mask match: "
          f"{np.array_equal(fin, np.isfinite(np.asarray(res_b.dist)))}")
