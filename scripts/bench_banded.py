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

res_b = res_s = res_p = None
if which in ("both", "pallas", "all"):
    from mesh_navigation_tpu.ops import pallas_banded
    kplan = pallas_banded.build_banded_kernel_plan(mesh, W)
    print(f"# kernel plan coverage {kplan.coverage:.4f} n_scan={kplan.n_scan}", file=sys.stderr)
    fp = jax.jit(lambda s: pallas_banded.batched_field_banded_pallas(mesh, W, kplan, s))
    res_p = timeit("pallas-banded", fp)
if which in ("both", "banded", "all"):
    plan_b = banded.build_banded_plan(mesh, W)
    print(f"# banded coverage {plan_b.coverage:.4f} n_cols={plan_b.n_cols}", file=sys.stderr)
    fb = jax.jit(lambda s: banded.batched_field_banded(mesh, W, plan_b, s))
    res_b = timeit("banded", fb)
if which in ("both", "structured", "all"):
    plan_s = structured.build_offset_plan(mesh, W)
    fs = jax.jit(lambda s: structured.batched_field_structured(mesh, W, plan_s, s, block_sweeps=16))
    res_s = timeit("structured", fs)
ref = res_b if res_b is not None else res_s
for name, other in (("structured", res_s), ("pallas", res_p)):
    if ref is None or other is None or other is ref:
        continue
    d = np.abs(np.asarray(ref.dist) - np.asarray(other.dist))
    fin = np.isfinite(np.asarray(ref.dist))
    print(f"{name} vs ref: max |delta| over finite: {d[fin].max():.2e}; "
          f"inf-mask match: {np.array_equal(fin, np.isfinite(np.asarray(other.dist)))}")
